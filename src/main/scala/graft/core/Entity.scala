package graft.core

import graft.geom._
import graft.index.{Geohash, H3}
import org.locationtech.jts.geom.Geometry
import scala.collection.mutable.ArrayBuffer

/** Input-format sniffing + entity parsing — the engine's ingestion kernel.
  *
  * Mirrors the reference's `Input` layer (`src/geoq/input.rs:35-52`, regex
  * priority LatLon > H3 > Geohash > GeoJSON > WKT) and `Entity` layer
  * (`src/geoq/entity.rs:42-211`): one line can fan out to several entities
  * (multi-geometry WKT lines, GeoJSON FeatureCollections), each keeping its
  * raw text, a geometry, and properties.
  *
  * These are pure driver/executor-side functions; Spark operators use them
  * inside `flatMap`, keeping parse + format sniff inside whole-stage codegen
  * boundaries as ordinary deterministic lambdas.
  */
final case class GeoqException(msg: String) extends Exception(msg)

final case class Entity(kind: String, raw: String, geom: Geometry, props: JObject) {
  /** Debug label matching the reference's Display (`entity.rs:24-40`). */
  def label: String = kind match {
    case Entity.LatLon     => s"LatLon: $raw"
    case Entity.GeohashK   => s"Geohash: $raw"
    case Entity.Wkt        => s"WKT: $raw"
    case Entity.GjFeature  => s"GeoJSON Feature: $raw"
    case Entity.GjGeometry => s"GeoJSON Geometry: $raw"
    case Entity.H3Cell     => s"H3 Cell: $raw at resolution ${H3.resolution(H3.fromString(raw))}"
    case other             => s"$other: $raw"
  }
}

object Entity {
  val LatLon = "latlon"
  val GeohashK = "geohash"
  val Wkt = "wkt"
  val GjFeature = "geojson_feature"
  val GjGeometry = "geojson_geometry"
  val H3Cell = "h3"

  private val LATLON_RE = "^-?\\d+\\.?\\d*[,\\t]-?\\d+\\.?\\d*$".r
  private val H3_RE = "(?i)^0?[0-9a-f]{15,16}$".r

  /** Format detection with the reference's exact priority + regexes
    * (`src/geoq/input.rs:6-12,35-52`). Returns None for unmatchable lines
    * (reference: hard `InvalidInput` error). */
  def detect(line: String): Option[String] = {
    if (LATLON_RE.findFirstIn(line).isDefined) Some(LatLon)
    else if (H3_RE.findFirstIn(line).isDefined) Some(H3Cell)
    else if (isBase32Line(line)) Some(GeohashK)
    else if (line.contains("{")) Some("geojson")
    else if (isWktLine(line)) Some(Wkt)
    else None
  }

  private def isBase32Line(line: String): Boolean = {
    // (?i)^[0-9a-z&&[^ailo]]+$ — base-32 charset, case-insensitive
    if (line.isEmpty) return false
    var i = 0
    while (i < line.length) {
      val c = Character.toLowerCase(line.charAt(i))
      val ok = (c >= '0' && c <= '9') ||
        (c >= 'a' && c <= 'z' && c != 'a' && c != 'i' && c != 'l' && c != 'o')
      if (!ok) return false
      i += 1
    }
    true
  }

  private def isWktLine(line: String): Boolean = {
    // reference regex `(?ix)^point|linestring|polygon|multipoint|…`: the ^
    // binds only to the first alternative, so every other keyword matches
    // anywhere in the line (`src/geoq/input.rs:10-12`).
    val l = line.toLowerCase
    l.startsWith("point") || l.contains("linestring") || l.contains("polygon") ||
      l.contains("multipoint")
  }

  /** One input line → entities. Throws GeoqException on invalid input,
    * matching the reference's fail-fast pipeline (`src/geoq/par.rs:136-139`). */
  def parseLine(line: String): Seq[Entity] = detect(line) match {
    case None => throw GeoqException(s"Unable to parse single-line input: $line")
    case Some(LatLon) =>
      val parts = line.split("[,\\t]")
      val lat = parts(0).toDouble
      val lon = parts(1).toDouble
      Seq(Entity(LatLon, line, Geo.point(lon, lat), JObject.empty))
    case Some(GeohashK) =>
      Seq(Entity(GeohashK, line, Geohash.bboxPolygon(line), JObject.empty))
    case Some(H3Cell) =>
      val cell = H3.fromString(line)
      if (!H3.isValidCell(cell)) throw GeoqException(s"Unable to parse String as H3 Cell: $line")
      Seq(Entity(H3Cell, H3.toString(cell), H3.cellPolygon(cell), h3Props(cell)))
    case Some(Wkt) =>
      val geoms =
        try splitWkt(line).map(Geo.parseWkt)
        catch { case _: Exception => throw GeoqException("InvalidWkt") }
      // raw = re-serialized canonical WKT, like the wkt crate's Display
      // round-trip in the reference (`entity.rs:73-76`).
      geoms.map(g => Entity(Wkt, Geo.toWkt(g), g, JObject.empty))
    case Some("geojson") => parseGeoJson(line)
    case Some(other) => throw GeoqException(s"unknown kind $other")
  }

  def h3Props(cell: Long): JObject = JObject.of(
    "resolution" -> JLong(H3.resolution(cell)),
    "id" -> JString(H3.toString(cell)),
    "index" -> JLong(cell))

  private def parseGeoJson(raw: String): Seq[Entity] = {
    val v =
      try Json.parse(raw)
      catch { case e: Exception => throw GeoqException(s"Error parsing geojson: $raw") }
    v match {
      case o: JObject => parsedGeoJson(raw, o)
      case _          => throw GeoqException(s"Error parsing geojson: $raw")
    }
  }

  private def parsedGeoJson(raw: String, o: JObject): Seq[Entity] =
    o.fields.get("type") match {
      case Some(JString("Feature")) => Seq(featureEntity(raw, o))
      case Some(JString("FeatureCollection")) =>
        o.fields.get("features") match {
          case Some(JArray(fs)) =>
            fs.map {
              case f: JObject =>
                // FC members are re-serialized canonically, the reference's
                // serde round-trip (`entity.rs:88-95`).
                val geom = featureGeometry(f)
                val props = featureProps(f)
                Entity(GjFeature, Geo.featureJsonString(geom, props), geom, props)
              case _ => throw GeoqException(s"Error parsing geojson: $raw")
            }
          case _ => throw GeoqException(s"Error parsing geojson: $raw")
        }
      case Some(JString(_)) => Seq(Entity(GjGeometry, raw, Geo.geometryFromJson(o), JObject.empty))
      case _ => throw GeoqException(s"Error parsing geojson: $raw")
    }

  private def featureGeometry(f: JObject): Geometry = f.fields.get("geometry") match {
    case Some(g: JObject) => Geo.geometryFromJson(g)
    case _ => throw GeoqException("Feature without geometry")
  }

  private def featureProps(f: JObject): JObject = f.fields.get("properties") match {
    case Some(p: JObject) => p
    case _                => JObject.empty
  }

  private def featureEntity(raw: String, f: JObject): Entity =
    Entity(GjFeature, raw, featureGeometry(f), featureProps(f))

  /** Split a WKT line that may hold several concatenated geometries into
    * per-geometry substrings (the wkt crate parses a Vec of items,
    * `src/geoq/entity.rs:68-82`). Split points = geometry keywords at
    * paren-depth 0. */
  def splitWkt(line: String): Seq[String] = {
    val l = line.toLowerCase
    val keywords = Seq("geometrycollection", "multilinestring", "multipolygon",
      "multipoint", "linestring", "polygon", "point")
    val starts = new ArrayBuffer[Int]
    var depth = 0
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0) {
        keywords.find(k => l.startsWith(k, i)) match {
          case Some(k) => starts += i; i += k.length
          case None    => i += 1
        }
      } else i += 1
    }
    if (starts.isEmpty) Seq(line)
    else
      starts.indices.map { j =>
        val from = starts(j)
        val until = if (j + 1 < starts.length) starts(j + 1) else line.length
        line.substring(from, until).trim.stripSuffix(",").trim
      }
  }
}
