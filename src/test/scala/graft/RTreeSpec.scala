package graft

import graft.core.Entity
import graft.geom.Geo
import graft.index.Hilbert
import graft.ops.PackedRTree
import org.scalatest.funsuite.AnyFunSuite

/** Packed R-tree structural vectors (`src/geoq/fgb/index.rs:148-170`) and
  * the countries bbox-select fixture (`src/geoq/fgb/mod.rs:275-304`:
  * 179 features, bbox (8.8,47.2,9.5,55.3) → 6). */
class RTreeSpec extends AnyFunSuite {

  test("level bounds reference vectors") {
    val a = PackedRTree.levelBounds(179)
    assert(a.numNodes == 192)
    assert(a.nodesPerLevel == Vector(1, 12, 179))
    assert(a.levelBounds == Vector(0 until 1, 1 until 13, 13 until 192))

    val b = PackedRTree.levelBounds(15)
    assert(b.numNodes == 16)
    assert(b.nodesPerLevel == Vector(1, 15))

    val c = PackedRTree.levelBounds(100000)
    assert(c.numNodes == 106669)
    assert(c.nodesPerLevel == Vector(1, 2, 25, 391, 6250, 100000))
    assert(c.levelBounds == Vector(0 until 1, 1 until 3, 3 until 28,
      28 until 419, 419 until 6669, 6669 until 106669))
  }

  test("countries fixture: hilbert sort + tree + bbox select = 6 of 179") {
    val lines = scala.io.Source.fromFile(
      "/root/reference/tests/resources/countries.geojson").getLines().toSeq
    val feats = lines.flatMap(Entity.parseLine)
    assert(feats.size == 179)

    // per-feature bbox + dataset extent (reference hilbert.rs:211-233)
    val boxes = feats.map(f => Geo.bbox(f.geom))
    val extent = boxes.reduce((a, b) =>
      (math.min(a._1, b._1), math.min(a._2, b._2),
        math.max(a._3, b._3), math.max(a._4, b._4)))

    // stable hilbert sort by bbox center scaled into the extent
    val indexed = boxes.zipWithIndex.map { case (b, i) =>
      val h = Hilbert.hilbertBbox((b._1 + b._3) / 2.0, (b._2 + b._4) / 2.0,
        extent._1, extent._2, extent._3, extent._4)
      (h, i, b)
    }.sortBy(_._1)

    val leaves = indexed.map { case (_, i, b) =>
      PackedRTree.Node(b._1, b._2, b._3, b._4, i.toLong)
    }.toIndexedSeq
    val (meta, tree) = PackedRTree.build(leaves)
    assert(meta.numNodes == 192)

    val hits = PackedRTree.search(meta, tree, 8.8, 47.2, 9.5, 55.3)
    assert(hits.size == 6, s"expected 6 bbox hits, got ${hits.size}")

    // sanity: the hits are the central-European countries whose bboxes
    // overlap (8.8..9.5, 47.2..55.3)
    val names = hits.map { leafIdx =>
      val featIdx = tree(meta.levelBounds.last.start + leafIdx).offset.toInt
      val props = feats(featIdx).props.fields
      props.get("name").collect { case graft.geom.JString(s) => s }.getOrElse("?")
    }.toSet
    assert(names.contains("Germany"))
    assert(names.contains("Switzerland"))
  }
}
