package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Packed Hilbert R-tree — the reference's FGB spatial index
  * (`src/geoq/fgb/index.rs`): a flattened bottom-up tree over
  * hilbert-sorted feature bboxes, NODE_SIZE=16 children per node, stored
  * level-by-level root-first; leaf offsets point at features, internal
  * offsets at the child slot start.
  *
  * In the engine this is a driver-side index for small reference layers
  * (the distributed analog is parquet row-group stats over
  * hilbert-clustered files — TableIO); it exists here because the
  * reference pins exact structural vectors we can verify:
  * 179 features → levels [1,12,179], 192 nodes (`index.rs:148-170`), and
  * the countries bbox-select fixture (6 of 179 for 8.8,47.2,9.5,55.3).
  */
object PackedRTree {
  val NODE_SIZE = 16
  val NODE_STORAGE_BYTES = 40

  final case class Node(var minX: Double, var minY: Double,
                        var maxX: Double, var maxY: Double, var offset: Long)

  final case class Meta(numFeatures: Int, numNodes: Int,
                        nodesPerLevel: Vector[Int], levelBounds: Vector[Range])

  /** Mirror of `calculate_level_bounds` (`index.rs:111-146`). */
  def levelBounds(numFeatures: Int, nodeSize: Int = NODE_SIZE): Meta = {
    var perLevel = List(numFeatures)
    var cur = numFeatures
    var done = false
    while (!done) {
      val next = if (cur % nodeSize == 0) cur / nodeSize else cur / nodeSize + 1
      if (next == 1) { perLevel = 1 :: perLevel; done = true }
      else { perLevel = next :: perLevel; cur = next }
    }
    val nodesPerLevel = perLevel.toVector
    var soFar = 0
    val bounds = nodesPerLevel.map { n =>
      val r = soFar until (soFar + n)
      soFar += n
      r
    }
    Meta(numFeatures, nodesPerLevel.sum, nodesPerLevel, bounds)
  }

  /** Build the flattened tree from hilbert-sorted leaf nodes
    * (bbox + offset), mirroring `build_flattened_tree` (`index.rs:19-91`). */
  def build(sortedLeaves: IndexedSeq[Node], nodeSize: Int = NODE_SIZE): (Meta, Array[Node]) = {
    val meta = levelBounds(sortedLeaves.length, nodeSize)
    val tree = Array.fill(meta.numNodes)(Node(0, 0, 0, 0, 0))
    val bottom = meta.levelBounds.last
    var i = 0
    while (i < sortedLeaves.length) {
      tree(bottom.start + i) = sortedLeaves(i)
      i += 1
    }
    // non-leaf levels bottom-up
    var levelIdx = meta.levelBounds.length - 2
    while (levelIdx >= 0) {
      val level = meta.levelBounds(levelIdx)
      val prev = meta.levelBounds(levelIdx + 1)
      var k = 0
      level.foreach { nodeIndex =>
        val from = prev.start + k * nodeSize
        val until = math.min(prev.start + (k + 1) * nodeSize, prev.end)
        var minX = Double.MaxValue; var minY = Double.MaxValue
        var maxX = Double.MinValue; var maxY = Double.MinValue
        var j = from
        while (j < until) {
          val c = tree(j)
          if (c.minX < minX) minX = c.minX
          if (c.minY < minY) minY = c.minY
          if (c.maxX > maxX) maxX = c.maxX
          if (c.maxY > maxY) maxY = c.maxY
          j += 1
        }
        tree(nodeIndex) = Node(minX, minY, maxX, maxY, from)
        k += 1
      }
      levelIdx -= 1
    }
    (meta, tree)
  }

  /** Indices (into the hilbert-sorted leaf order) of features whose bbox
    * intersects the query box — the FGB reader's bbox select. */
  def search(meta: Meta, tree: Array[Node],
             minX: Double, minY: Double, maxX: Double, maxY: Double): Seq[Int] = {
    val leafStart = meta.levelBounds.last.start
    val out = new ArrayBuffer[Int]
    def intersects(n: Node): Boolean =
      !(n.maxX < minX || n.minX > maxX || n.maxY < minY || n.minY > maxY)
    def visit(nodeIndex: Int, levelIdx: Int): Unit = {
      val n = tree(nodeIndex)
      if (!intersects(n)) return
      if (levelIdx == meta.levelBounds.length - 1) {
        out += (nodeIndex - leafStart)
      } else {
        val childLevel = meta.levelBounds(levelIdx + 1)
        val from = n.offset.toInt
        val until = math.min(from + NODE_SIZE, childLevel.end)
        var j = from
        while (j < until) { visit(j, levelIdx + 1); j += 1 }
      }
    }
    visit(0, 0)
    out.toSeq
  }

  /** Little-endian 40-byte node serialization (`index.rs:94-106`). */
  def serialize(tree: Array[Node]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(tree.length * NODE_STORAGE_BYTES)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tree.foreach { n =>
      buf.putDouble(n.minX); buf.putDouble(n.minY)
      buf.putDouble(n.maxX); buf.putDouble(n.maxY)
      buf.putLong(n.offset)
    }
    buf.array()
  }
}
