package graft.index

import org.locationtech.jts.geom.Polygon

/** H3 icosahedral projection math — latLngToCell, cellToBoundary, gridDisk.
  *
  * NOT YET IMPLEMENTED (round-1 stub): the geohash cell path carries the
  * tiling/join engine meanwhile (fully golden-verified, SURVEY §7 risk #1).
  * The pentagon base-cell set below is spec data needed by the bit-level
  * validity checks in [[H3]].
  */
object H3Geo {
  /** The 12 pentagon base cells (public H3 spec, res-0 icosahedron vertices). */
  private val PENTAGON_BASE_CELLS: Set[Int] =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  def isPentagon(baseCell: Int): Boolean = PENTAGON_BASE_CELLS.contains(baseCell)

  def latLngToCell(lat: Double, lon: Double, res: Int): Long =
    throw new UnsupportedOperationException("H3 latLngToCell: pending (use geohash tiling)")

  def cellPolygon(cell: Long): Polygon =
    throw new UnsupportedOperationException("H3 cellPolygon: pending (use geohash tiling)")

  def gridDisk(cell: Long, k: Int): Seq[Long] =
    throw new UnsupportedOperationException("H3 gridDisk: pending (use geohash tiling)")
}
