package graft.index

import graft.core.GeoqException
import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.PreparedGeometryFactory

/** H3 covering operators mirroring the reference's `h3 covering`
  * (`/root/reference/src/geoq/commands/h3.rs:421-548`):
  *
  *  - Point/MultiPoint → the containing cell(s) (`h3.rs:517-520`);
  *  - LineString → BFS flood-fill from the first vertex's cell, keeping
  *    cells whose hexagon intersects the line (`h3.rs:443-467`);
  *  - Polygon/MultiPolygon/Triangle/Rect → polyfill: cells whose CENTER is
  *    inside the polygon, found by BFS over intersecting cells (the
  *    h3ron `polygon_to_cells` centroid-containment semantics,
  *    `h3.rs:421-441`); MultiPolygon members deduped;
  *  - `--compact` runs H3 compaction (`h3.rs:536-539`).
  *
  * Output order: the reference iterates HashSets (nondeterministic), so its
  * own tests can only be set-equality; we emit cells in ascending unsigned
  * id order (deterministic, set-equal — FIXTURES.md).
  */
object H3Cover {

  private def cellOf(c: Coordinate, res: Int): Long = H3Geo.latLngToCell(c.y, c.x, res)

  /** BFS over cells whose polygon intersects `g`, starting from `seed`.
    * `keepAll = true` emits every intersecting cell (line/superset
    * coverings); `false` emits only cells whose CENTER is inside `g`
    * (polyfill semantics — the center test doubles as the fast accept). */
  private def flood(g: Geometry, seed: Long, res: Int, keepAll: Boolean): Set[Long] = {
    val prep = PreparedGeometryFactory.prepare(g)
    val env = g.getEnvelopeInternal
    // center-point fast accept only for AREAL queries: center ∈ g implies
    // the cell intersects g, and for the interior-cell majority of a
    // polyfill the point-contains is far cheaper than constructing the
    // split cell geometry and running the polygon intersects (a line
    // almost never contains a point — the test would be pure waste there)
    val areal = g.getDimension == 2
    val seen = scala.collection.mutable.Set[Long](seed)
    val queue = scala.collection.mutable.Queue[Long](seed)
    val out = scala.collection.mutable.Set[Long]()
    while (queue.nonEmpty) {
      val cell = queue.dequeue()
      // Envelope pre-filter: most tested cells are the flood's FRONTIER
      // ring (visited, found non-intersecting, discarded); for an ordinary
      // non-wrapping cell the vertex min/max IS the planar polygon's exact
      // envelope, so envelope-disjoint cells skip geometry construction
      // and the prepared intersects entirely. Wrap/pole suspects (lon span
      // > 180°) fall through to the full split test — pure fast-path, no
      // decision change.
      val b = H3Geo.cellBoundaryCached(cell)
      var minLat = 90.0; var maxLat = -90.0
      var minLon = 180.0; var maxLon = -180.0
      var i = 0
      while (i < b.length) {
        val la = b(i)._1; val lo = b(i)._2
        if (la < minLat) minLat = la
        if (la > maxLat) maxLat = la
        if (lo < minLon) minLon = lo
        if (lo > maxLon) maxLon = lo
        i += 1
      }
      val mayHit = (maxLon - minLon > 180.0) ||
        !(maxLon < env.getMinX || minLon > env.getMaxX ||
          maxLat < env.getMinY || minLat > env.getMaxY)
      if (mayHit) {
        val centerIn = areal && {
          val (la, ln) = H3Geo.cellToLatLng(cell)
          prep.contains(H3Geo.gf.createPoint(new Coordinate(ln, la)))
        }
        // split geometry: cells straddling ±180 (or a pole) test correctly
        // against planar query geometry instead of wrapping the whole map
        if (centerIn || prep.intersects(H3Geo.cellGeometrySplitCached(cell))) {
          if (keepAll || centerIn) out += cell
          H3Geo.neighborsCached(cell).foreach { n =>
            if (!seen.contains(n)) { seen += n; queue += n }
          }
        }
      }
    }
    out.toSet
  }

  /** Line flood-fill: all cells whose hexagon intersects the linestring. */
  def lineCells(ls: LineString, res: Int): Set[Long] = {
    if (ls.isEmpty) return Set.empty
    flood(ls, cellOf(ls.getCoordinateN(0), res), res, keepAll = true)
  }

  /** Polyfill: cells whose center lies inside the polygon (holes respected).
    * BFS from the first exterior vertex's cell over intersecting cells —
    * scale note: per-geometry work is row-local (a flatMap kernel); at 100 TB
    * the polygon side is the small broadcast side, never the scan side. */
  def polygonCells(poly: Polygon, res: Int): Set[Long] = {
    if (poly.isEmpty) return Set.empty
    flood(poly, cellOf(poly.getExteriorRing.getCoordinateN(0), res), res, keepAll = false)
  }

  /** ALL cells whose hexagon intersects the geometry — the SUPERSET
    * covering used for join-candidate generation (polyfill's
    * center-containment would miss edge-straddling cells and drop join
    * results; this can only over-generate, and the exact predicate refines). */
  def intersectingCells(g: Geometry, res: Int): Set[Long] = {
    if (g.isEmpty) return Set.empty
    flood(g, cellOf(g.getCoordinate, res), res, keepAll = true)
  }

  /** Covering of any geometry the reference accepts; GeometryCollection is
    * rejected exactly like the reference (`h3.rs:527-530`). */
  def geomCells(g: Geometry, res: Int): Set[Long] = g match {
    case p: Point      => Set(cellOf(p.getCoordinate, res))
    case mp: MultiPoint =>
      (0 until mp.getNumGeometries).map(i => cellOf(mp.getGeometryN(i).getCoordinate, res)).toSet
    case ls: LineString => lineCells(ls, res)
    case mls: MultiLineString =>
      (0 until mls.getNumGeometries).flatMap(i =>
        lineCells(mls.getGeometryN(i).asInstanceOf[LineString], res)).toSet
    case poly: Polygon => polygonCells(poly, res)
    case mp: MultiPolygon =>
      (0 until mp.getNumGeometries).flatMap(i =>
        polygonCells(mp.getGeometryN(i).asInstanceOf[Polygon], res)).toSet
    case other =>
      throw GeoqException(
        s"geoq h3 polyfill requires Polygon or MultiPolygon geometries -- got ${other.getGeometryType}")
  }

  /** All 122 res-0 base cells. */
  def res0Cells: Seq[Long] = (0 until 122).map(H3Geo.res0Cell)

  /** The reference's TOP-DOWN multi-resolution covering — written but never
    * wired to its CLI (`commands/h3.rs:291-418` is dead code; implemented
    * here as an optional mode so every reference algorithm has a twin).
    * Descend group-by-group from a start cover: when every cell of a
    * sibling group has its CENTER inside the geometry (and the group is
    * below `minRes`'s depth), emit the PARENT — multi-resolution
    * compaction on the fly; otherwise recurse into the intersecting cells'
    * children, emitting center-contained cells at `maxRes`.
    *
    * Documented deviations from the dead reference code:
    *  - its start-cell search iterates `(max_res..=0)` — an EMPTY Rust
    *    range — so it always fell back to the 122 res-0 cells; we
    *    implement the evident intent (finest single cell at the centroid
    *    whose polygon covers the geometry, else the res-0 fallback);
    *  - cells are emitted in ascending unsigned id order (the reference
    *    emits in queue order and was never golden-tested);
    *  - geometry tests use the antimeridian/pole-safe split form, like
    *    every other covering here.
    *
    * Properties (H3GeoSpec): expanding the result to `maxRes` is a
    * SUPERSET of `polygonCells(g, maxRes)`; every emitted `maxRes` cell is
    * in that polyfill; no emitted cell is an ancestor of another. */
  def topDownCovering(g: Geometry, minRes: Int, maxRes: Int): Set[Long] = {
    if (minRes > maxRes || minRes < 0 || maxRes > 15)
      throw GeoqException(
        s"Min resolution must be less than or equal to max resolution. Got min: $minRes, max: $maxRes")
    g match { // same contract as polygonCells (centroid tests are 2-D)
      case _: Polygon | _: MultiPolygon =>
      case other => throw GeoqException(
        s"geoq h3 polyfill requires Polygon or MultiPolygon geometries -- got ${other.getGeometryType}")
    }
    if (g.isEmpty) return Set.empty
    val prep = PreparedGeometryFactory.prepare(g)
    val cen = g.getCentroid
    val start: Seq[Long] = (maxRes to 0 by -1).iterator
      .map(r => H3Geo.latLngToCell(cen.getY, cen.getX, r))
      .find(c => H3Geo.cellGeometrySplit(c).covers(g))
      .map(Seq(_))
      .getOrElse(res0Cells)
    final case class Group(cells: Seq[Long], res: Int, parent: Option[Long])
    val queue = scala.collection.mutable.Queue[Group](
      Group(start, H3.resolution(start.head), None))
    val out = scala.collection.mutable.Set[Long]()
    while (queue.nonEmpty) {
      val grp = queue.dequeue()
      val rels = grp.cells.map { cell =>
        // point test FIRST: a center inside g implies the cell intersects
        // g, so the cheap contains doubles as the fast accept and the
        // expensive split-geometry intersects only runs on frontier cells
        val cenIn = {
          val (la, ln) = H3Geo.cellToLatLng(cell)
          prep.contains(H3Geo.gf.createPoint(new Coordinate(ln, la)))
        }
        val inter = cenIn || prep.intersects(H3Geo.cellGeometrySplitCached(cell))
        (cell, inter, cenIn)
      }
      if (grp.res > minRes && rels.forall(_._3) && grp.parent.isDefined)
        out += grp.parent.get // whole sibling set interior → keep the parent
      else rels.foreach { case (cell, intersects, cenIn) =>
        if (intersects) {
          if (grp.res == maxRes) { if (cenIn) out += cell }
          else if (grp.res < 15)
            queue += Group(H3.cellToChildren(cell, grp.res + 1), grp.res + 1, Some(cell))
        }
      }
    }
    out.toSet
  }

  /** H3 compaction: replace every complete sibling set (7 children; 6 for a
    * pentagon parent) by its parent, repeatedly. Pure bit ops.
    *
    * Level-descending scan: cells are bucketed by resolution and each
    * level is sorted so that siblings (same parent prefix, one differing
    * digit) are ADJACENT — complete runs merge into the next level down,
    * where they may cascade. Complete sibling sets are disjoint, so the
    * maximal compaction is a unique fixpoint and level order reaches the
    * same result as the previous iterate-until-unchanged groupBy — at a
    * fraction of the allocations (the old Set/Map churn was 78% of the
    * q37 kernel's 27 µs/row and GC-amplified under 32 concurrent tasks). */
  def compact(cells: Set[Long]): Set[Long] = {
    if (cells.isEmpty) return cells
    val byRes = new Array[scala.collection.mutable.ArrayBuffer[Long]](16)
    var maxRes = 0
    cells.foreach { c =>
      val r = H3.resolution(c)
      if (byRes(r) == null) byRes(r) = new scala.collection.mutable.ArrayBuffer[Long]
      byRes(r) += c
      if (r > maxRes) maxRes = r
    }
    val out = Set.newBuilder[Long]
    var r = maxRes
    while (r > 0) {
      val pool = byRes(r)
      if (pool != null && pool.nonEmpty) {
        val arr = pool.toArray
        java.util.Arrays.sort(arr) // valid cells have bit 63 clear: signed == unsigned order
        // dedupe in place: an input that contains BOTH a parent and all its
        // children re-adds the parent on merge; the old Set semantics kept
        // one copy, and a duplicate would inflate a sibling-run count
        var m = 0
        var t = 0
        while (t < arr.length) {
          if (m == 0 || arr(t) != arr(m - 1)) { arr(m) = arr(t); m += 1 }
          t += 1
        }
        var i = 0
        while (i < m) {
          val parent = H3.cellToParent(arr(i), r - 1)
          var j = i + 1
          while (j < m && H3.cellToParent(arr(j), r - 1) == parent) j += 1
          val want = if (H3.isPentagon(parent)) 6 else 7
          if (j - i == want) {
            if (byRes(r - 1) == null)
              byRes(r - 1) = new scala.collection.mutable.ArrayBuffer[Long]
            byRes(r - 1) += parent
          } else {
            var k = i
            while (k < j) { out += arr(k); k += 1 }
          }
          i = j
        }
      }
      r -= 1
    }
    if (byRes(0) != null) byRes(0).foreach(out += _)
    out.result()
  }

  /** Deterministic emission order for set-valued results. */
  def ordered(cells: Set[Long]): Seq[Long] =
    cells.toSeq.sorted(Ordering.fromLessThan[Long]((a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
}
