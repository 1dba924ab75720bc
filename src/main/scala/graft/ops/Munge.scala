package graft.ops

import graft.core.{Entity, GeoqException}
import graft.geom._
import org.apache.spark.sql.Dataset
import org.locationtech.jts.geom.Geometry

/** `geoq json munge`: arbitrary JSON object → GeoJSON Feature by ordered
  * geometry-extraction heuristics (reference `src/geoq/commands/json.rs:61-130`,
  * goldens `tests/cli_test.rs:576-612`):
  *   1. lat/lon number-or-numeric-string under {latitude,lat} × {longitude,lon,lng}
  *   2. WKT string under {geometry,wkt}
  *   3. GeoJSON geometry STRING under {geometry,geojson}
  *   4. GeoJSON geometry OBJECT under {geometry,geojson}
  * Matched keys are removed; the remainder becomes properties. Non-object or
  * no-match input is an error. Quirk preserved: a present-but-unparseable
  * first key aborts that heuristic rather than falling through to later keys
  * (reference find_number/find_string early returns).
  */
object Munge {

  private def findNumber(o: JObject, keys: Seq[String]): Option[(String, Double)] = {
    keys.foreach { k =>
      o.fields.get(k) match {
        case None => // continue
        case Some(JLong(l))   => return Some((k, l.toDouble))
        case Some(JDouble(d)) => return Some((k, d))
        case Some(JString(s)) => return s.toDoubleOption.map(d => (k, d))
        case Some(_) => // continue (non-number, non-string)
      }
    }
    None
  }

  private def findString(o: JObject, keys: Seq[String]): Option[(String, String)] = {
    keys.foreach { k =>
      o.fields.get(k) match {
        case Some(JString(s)) => return Some((k, s))
        case _ => // continue
      }
    }
    None
  }

  private def findObject(o: JObject, keys: Seq[String]): Option[(String, JObject)] = {
    keys.foreach { k =>
      o.fields.get(k) match {
        case Some(j: JObject) => return Some((k, j))
        case _ => // continue
      }
    }
    None
  }

  /** Geometry + the keys it consumed, or None. */
  def findGeometry(o: JObject): Option[(Geometry, Seq[String])] = {
    // 1. lat/lon pair
    val latlon = for {
      (latK, lat) <- findNumber(o, Seq("latitude", "lat"))
      (lonK, lon) <- findNumber(o, Seq("longitude", "lon", "lng"))
    } yield (Geo.point(lon, lat): Geometry, Seq(latK, lonK))
    if (latlon.isDefined) return latlon

    // 2. WKT string
    findString(o, Seq("geometry", "wkt")).foreach { case (k, s) =>
      try {
        val geoms = Entity.splitWkt(s).map(Geo.parseWkt)
        if (geoms.nonEmpty) return Some((geoms.head, Seq(k)))
      } catch { case _: Exception => }
    }

    // 3. GeoJSON geometry string
    findString(o, Seq("geometry", "geojson")).foreach { case (k, s) =>
      try {
        Json.parse(s) match {
          case g: JObject if g.fields.get("type").exists {
            case JString(t) => t != "Feature" && t != "FeatureCollection"
            case _ => false
          } => return Some((Geo.geometryFromJson(g), Seq(k)))
          case _ =>
        }
      } catch { case _: Exception => }
    }

    // 4. GeoJSON geometry object
    findObject(o, Seq("geometry", "geojson")).foreach { case (k, g) =>
      try return Some((Geo.geometryFromJson(g), Seq(k)))
      catch { case _: Exception => }
    }

    None
  }

  /** One JSON line → canonical Feature string. Errors mirror the reference
    * (InvalidJSONType). */
  def mungeLine(line: String): String = {
    val v =
      try Json.parse(line)
      catch { case _: Exception => throw GeoqException("InvalidJSONType") }
    v match {
      case o: JObject =>
        findGeometry(o) match {
          case Some((geom, consumed)) =>
            val props = JObject(consumed.foldLeft(o.fields)((m, k) => m - k))
            Geo.featureJsonString(geom, props)
          case None => throw GeoqException("InvalidJSONType")
        }
      case _ => throw GeoqException("InvalidJSONType")
    }
  }

  def munge(lines: Dataset[(Long, String)]): Dataset[(Long, Int, String)] = {
    import lines.sparkSession.implicits._
    lines.map { case (id, line) => (id, 0, mungeLine(line)) }
  }
}
