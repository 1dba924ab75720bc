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

  /** BFS over cells whose polygon intersects `g`, starting from `seed`;
    * `keep` selects which visited intersecting cells are emitted. */
  private def flood(g: Geometry, seed: Long, res: Int, keep: Long => Boolean): Set[Long] = {
    val prep = PreparedGeometryFactory.prepare(g)
    val seen = scala.collection.mutable.Set[Long](seed)
    val queue = scala.collection.mutable.Queue[Long](seed)
    val out = scala.collection.mutable.Set[Long]()
    while (queue.nonEmpty) {
      val cell = queue.dequeue()
      // split geometry: cells straddling ±180 (or a pole) test correctly
      // against planar query geometry instead of wrapping the whole map
      if (prep.intersects(H3Geo.cellGeometrySplit(cell))) {
        if (keep(cell)) out += cell
        H3Geo.neighbors(cell).foreach { n =>
          if (!seen.contains(n)) { seen += n; queue += n }
        }
      }
    }
    out.toSet
  }

  /** Line flood-fill: all cells whose hexagon intersects the linestring. */
  def lineCells(ls: LineString, res: Int): Set[Long] = {
    if (ls.isEmpty) return Set.empty
    flood(ls, cellOf(ls.getCoordinateN(0), res), res, _ => true)
  }

  /** Polyfill: cells whose center lies inside the polygon (holes respected).
    * BFS from the first exterior vertex's cell over intersecting cells —
    * scale note: per-geometry work is row-local (a flatMap kernel); at 100 TB
    * the polygon side is the small broadcast side, never the scan side. */
  def polygonCells(poly: Polygon, res: Int): Set[Long] = {
    if (poly.isEmpty) return Set.empty
    val prep = PreparedGeometryFactory.prepare(poly)
    val seed = cellOf(poly.getExteriorRing.getCoordinateN(0), res)
    flood(poly, seed, res, { cell =>
      val (lat, lng) = H3Geo.cellToLatLng(cell)
      prep.contains(H3Geo.gf.createPoint(new Coordinate(lng, lat)))
    })
  }

  /** ALL cells whose hexagon intersects the geometry — the SUPERSET
    * covering used for join-candidate generation (polyfill's
    * center-containment would miss edge-straddling cells and drop join
    * results; this can only over-generate, and the exact predicate refines). */
  def intersectingCells(g: Geometry, res: Int): Set[Long] = {
    if (g.isEmpty) return Set.empty
    flood(g, cellOf(g.getCoordinate, res), res, _ => true)
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

  /** H3 compaction: replace every complete sibling set (7 children; 6 for a
    * pentagon parent) by its parent, repeatedly. Pure bit ops. */
  def compact(cells: Set[Long]): Set[Long] = {
    var cur = cells
    var changed = true
    while (changed) {
      changed = false
      val candidates = cur.filter(c => H3.resolution(c) > 0).groupBy(c =>
        H3.cellToParent(c, H3.resolution(c) - 1))
      val next = scala.collection.mutable.Set[Long]()
      next ++= cur
      candidates.foreach { case (parent, kids) =>
        val want = if (H3.isPentagon(parent)) 6 else 7
        if (kids.size == want) {
          next --= kids
          next += parent
          changed = true
        }
      }
      cur = next.toSet
    }
    cur
  }

  /** Deterministic emission order for set-valued results. */
  def ordered(cells: Set[Long]): Seq[Long] =
    cells.toSeq.sorted(Ordering.fromLessThan[Long]((a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
}
