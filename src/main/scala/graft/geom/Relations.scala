package graft.geom

import org.locationtech.jts.geom.{Geometry, GeometryCollection, MultiPolygon, Point, Polygon}
import org.locationtech.jts.operation.distance.DistanceOp

/** Spatial predicates + geodesic distance with the reference's semantics.
  *
  * - `containsPoly` (reference `src/geoq/contains.rs:4-17`): polygon ⊇
  *   geometry with Multi-geometries / GeometryCollection requiring ALL components
  *   contained. JTS `contains` already applies the all-components rule for
  *   Multi geometries; GeometryCollection is recursed manually (JTS refuses
  *   relate on GCs).
  * - `intersects`: DE-9IM intersects, both the geo crate and JTS treat
  *   boundary contact as intersecting.
  * - `distance` (reference `src/geoq/distance.rs`): planar closest point,
  *   then Vincenty meters; polygons containing the point → 0;
  *   GeometryCollection takes the member with minimal Vincenty distance.
  */
object Relations {

  def containsPoly(outer: Polygon, inner: Geometry): Boolean = inner match {
    case gc: GeometryCollection if gc.getClass == classOf[GeometryCollection] =>
      // empty GC: vacuously true — reproduces the reference's
      // `gc.0.iter().all(...)` bug-for-bug (`src/geoq/contains.rs:14-16`)
      (0 until gc.getNumGeometries).forall(i => containsPoly(outer, gc.getGeometryN(i)))
    case g => outer.contains(g)
  }

  /** `contains_any` (reference `src/geoq/contains.rs:19-32`): outer must be
    * polygonal; MultiPolygon/GC allow ANY member to contain. */
  def containsAny(outer: Geometry, inner: Geometry): Boolean = outer match {
    case p: Polygon => containsPoly(p, inner)
    case mp: MultiPolygon =>
      (0 until mp.getNumGeometries).exists(i =>
        containsPoly(mp.getGeometryN(i).asInstanceOf[Polygon], inner))
    case gc: GeometryCollection if gc.getClass == classOf[GeometryCollection] =>
      (0 until gc.getNumGeometries).exists(i => containsAny(gc.getGeometryN(i), inner))
    case _ => false
  }

  def intersects(a: Geometry, b: Geometry): Boolean = a.intersects(b)

  /** Geodesic distance point → geometry in meters; None when indeterminate
    * (empty geometry / Vincenty non-convergence). */
  def distance(p: Point, g: Geometry): Option[Double] = g match {
    case gc: GeometryCollection if gc.getClass == classOf[GeometryCollection] =>
      if (gc.getNumGeometries == 0) return None
      val ds = (0 until gc.getNumGeometries).map(i => distance(p, gc.getGeometryN(i)))
      if (ds.forall(_.isEmpty)) None else Some(ds.flatten.min)
    case g if g.isEmpty => None
    case poly: Polygon if poly.contains(p) => Some(0.0)
    case mp: MultiPolygon if mp.contains(p) => Some(0.0)
    case g =>
      val nearest = DistanceOp.nearestPoints(g, p)(0)
      Vincenty.distance(nearest.x, nearest.y, p.getX, p.getY)
  }
}
