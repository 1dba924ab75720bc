package graft.ops

import org.locationtech.jts.geom._
import scala.collection.mutable

/** Topology-preserving Visvalingam–Whyatt simplification.
  *
  * The reference delegates to the geo crate's `simplifyvw_preserve`
  * (`src/geoq/simplify.rs:4-12`): (Multi)LineString/(Multi)Polygon are
  * simplified, all other kinds pass through. The reference repo carries NO
  * golden outputs for simplify, so this is a faithful implementation of the
  * published VW algorithm (Visvalingam & Whyatt 1993) with the
  * topology-preservation rule: a vertex is not removed if the shortcut
  * segment created by its removal would intersect any other current segment
  * of the same component.
  *
  * Semantics: vertices whose effective triangle area is < epsilon are
  * removal candidates, smallest first; endpoints are always kept; rings
  * retain ≥ 4 coords (closed), open lines ≥ 2.
  *
  * The `--to-coord-count` driver loop (epsilon doubling, max 20 iterations)
  * mirrors `commands/simplify.rs:5-28`.
  */
object Simplify {
  val MAX_ITERS = 20

  private def triArea(a: Coordinate, b: Coordinate, c: Coordinate): Double =
    math.abs((b.x - a.x) * (c.y - a.y) - (c.x - a.x) * (b.y - a.y)) / 2.0

  private def segIntersects(a1: Coordinate, a2: Coordinate,
                            b1: Coordinate, b2: Coordinate): Boolean = {
    // SEGMENT intersection (JTS Intersection.intersection is infinite-line
    // intersection — wrong tool); proper crossings and collinear overlaps
    // break topology, mere endpoint touching does not
    if (a1.equals2D(b1) || a1.equals2D(b2) || a2.equals2D(b1) || a2.equals2D(b2)) return false
    val li = new org.locationtech.jts.algorithm.RobustLineIntersector()
    li.computeIntersection(a1, a2, b1, b2)
    li.hasIntersection && (li.isProper || li.getIntersectionNum == 2)
  }

  /** VW-preserve on a coordinate sequence. `closed` = ring (first == last). */
  def simplifyCoords(coords: Array[Coordinate], epsilon: Double,
                     closed: Boolean): Array[Coordinate] = {
    val n = coords.length
    val minPts = if (closed) 4 else 2
    if (n <= minPts) return coords

    val alive = Array.fill(n)(true)
    val prev = Array.tabulate(n)(i => i - 1)
    val next = Array.tabulate(n)(i => i + 1)
    var nAlive = n

    case class Cand(area: Double, idx: Int, version: Int)
    implicit val ord: Ordering[Cand] = Ordering.by((c: Cand) => -c.area) // min-heap
    val version = Array.fill(n)(0)
    val heap = mutable.PriorityQueue.empty[Cand]
    def push(i: Int): Unit =
      if (i > 0 && i < n - 1)
        heap.enqueue(Cand(triArea(coords(prev(i)), coords(i), coords(next(i))), i, version(i)))
    (1 until n - 1).foreach(push)

    def wouldBreakTopology(p: Int, q: Int): Boolean = {
      // shortcut p-q vs all other alive segments
      var i = 0
      while (i < n - 1) {
        if (alive(i)) {
          val j = next(i)
          if (j < n && alive(j) && !(i == p && j == q) && i != p && j != p && i != q && j != q) {
            if (segIntersects(coords(p), coords(q), coords(i), coords(j))) return true
          }
        }
        i += 1
      }
      false
    }

    while (heap.nonEmpty && nAlive > minPts) {
      val c = heap.dequeue()
      if (alive(c.idx) && version(c.idx) == c.version) {
        if (c.area >= epsilon) return extract(coords, alive)
        val p = prev(c.idx); val q = next(c.idx)
        if (wouldBreakTopology(p, q)) {
          // retain this vertex permanently (invalidate without re-push)
          version(c.idx) += 1
        } else {
          alive(c.idx) = false
          nAlive -= 1
          next(p) = q; prev(q) = p
          version(p) += 1; version(q) += 1
          push(p); push(q)
        }
      }
    }
    extract(coords, alive)
  }

  private def extract(coords: Array[Coordinate], alive: Array[Boolean]): Array[Coordinate] =
    coords.zipWithIndex.collect { case (c, i) if alive(i) => c }

  def simplify(g: Geometry, epsilon: Double): Geometry = {
    val f = g.getFactory
    g match {
      case ls: LineString if !ls.isInstanceOf[LinearRing] =>
        f.createLineString(simplifyCoords(ls.getCoordinates, epsilon, closed = false))
      case p: Polygon =>
        val shell = f.createLinearRing(simplifyCoords(
          p.getExteriorRing.getCoordinates, epsilon, closed = true))
        val holes = (0 until p.getNumInteriorRing).map { i =>
          f.createLinearRing(simplifyCoords(
            p.getInteriorRingN(i).getCoordinates, epsilon, closed = true))
        }.toArray
        f.createPolygon(shell, holes)
      case mls: MultiLineString =>
        f.createMultiLineString((0 until mls.getNumGeometries).map(i =>
          simplify(mls.getGeometryN(i), epsilon).asInstanceOf[LineString]).toArray)
      case mp: MultiPolygon =>
        f.createMultiPolygon((0 until mp.getNumGeometries).map(i =>
          simplify(mp.getGeometryN(i), epsilon).asInstanceOf[Polygon]).toArray)
      case other => other // pass-through (reference simplify.rs:10)
    }
  }

  /** `--to-coord-count`: epsilon-doubling loop, reference
    * `commands/simplify.rs:11-27`. */
  def simplifyToCount(g: Geometry, epsilon: Double, target: Int): Geometry = {
    if (g.getNumPoints <= target) return g
    var simp = g
    var eps = epsilon
    var iters = 0
    while (simp.getNumPoints > target && iters < MAX_ITERS) {
      simp = simplify(simp, eps)
      eps *= 2.0
      iters += 1
    }
    simp
  }
}
