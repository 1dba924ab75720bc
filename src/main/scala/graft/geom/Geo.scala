package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader}

/** JTS interop: geometry factory, WKB codec (the engine's on-wire geometry
  * representation inside Datasets — BinaryType columns), geoq-format WKT
  * writer, canonical GeoJSON codec, and the reference's bbox semantics.
  *
  * Formatting invariants are semantics here (reference `tests/cli_test.rs`):
  *  - WKT: `TYPE(x y,x y)` — no space after the type name, no space after
  *    commas, shortest number form without forced `.0` (`cli_test.rs:62-70`).
  *  - GeoJSON geometry: compact, alphabetical keys, floats with `.0`
  *    (`cli_test.rs:90-98`).
  */
object Geo {
  val factory = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 4326)

  // ---- WKB codec. JTS readers/writers are stateful (not shareable across
  // threads) but reusable — thread-locals drop the per-row allocation in
  // the parse-heavy paths (q31/q32's constant factor). ----
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())
  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  def toWkb(g: Geometry): Array[Byte] = wkbWriter.get().write(g)
  def fromWkb(b: Array[Byte]): Geometry = wkbReader.get().read(b)

  def point(x: Double, y: Double): Point = factory.createPoint(new Coordinate(x, y))

  /** Axis-aligned box polygon with ring BL→BR→TR→TL→BL, matching the
    * reference's geohash bbox ring order (`src/geoq/entity.rs:49-61`). */
  def boxPolyBL(minX: Double, minY: Double, maxX: Double, maxY: Double): Polygon =
    factory.createPolygon(Array(
      new Coordinate(minX, minY), new Coordinate(maxX, minY),
      new Coordinate(maxX, maxY), new Coordinate(minX, maxY),
      new Coordinate(minX, minY)))

  /** Box polygon ring TR→TL→BL→BR→TR, the reference's `bbox` command ring
    * order (`src/geoq/bbox.rs:77-90`). */
  def boxPolyTR(minX: Double, minY: Double, maxX: Double, maxY: Double): Polygon =
    factory.createPolygon(Array(
      new Coordinate(maxX, maxY), new Coordinate(minX, maxY),
      new Coordinate(minX, minY), new Coordinate(maxX, minY),
      new Coordinate(maxX, maxY)))

  // ---- bbox (reference src/geoq/bbox.rs) ----
  /** (minX, minY, maxX, maxY). GeometryCollection folds member boxes seeded
    * with the zero rect (0,0,0,0) — reference behavior reproduced bug-for-bug
    * (`src/geoq/bbox.rs:65-69`). Empty geometries → zero rect. */
  def bbox(g: Geometry): (Double, Double, Double, Double) = g match {
    case gc: GeometryCollection if !gc.isInstanceOf[MultiPoint] &&
        !gc.isInstanceOf[MultiLineString] && !gc.isInstanceOf[MultiPolygon] =>
      var r = (0.0, 0.0, 0.0, 0.0)
      var i = 0
      while (i < gc.getNumGeometries) {
        val b = bbox(gc.getGeometryN(i))
        r = (math.min(r._1, b._1), math.min(r._2, b._2),
             math.max(r._3, b._3), math.max(r._4, b._4))
        i += 1
      }
      r
    case g if g.isEmpty => (0.0, 0.0, 0.0, 0.0)
    case g =>
      val e = g.getEnvelopeInternal
      (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }

  // ---- WKT ----
  def parseWkt(s: String): Geometry = wktReader.get().read(s)

  /** geoq/Rust-wkt-crate style WKT writer. */
  def toWkt(g: Geometry): String = {
    val sb = new StringBuilder
    writeWkt(g, sb)
    sb.toString
  }

  private def coordSeq(cs: CoordinateSequence, sb: StringBuilder): Unit = {
    var i = 0
    while (i < cs.size()) {
      if (i > 0) sb.append(',')
      sb.append(Num.rust(cs.getX(i))).append(' ').append(Num.rust(cs.getY(i)))
      i += 1
    }
  }

  private def polyBody(p: Polygon, sb: StringBuilder): Unit = {
    sb.append('(')
    sb.append('(')
    coordSeq(p.getExteriorRing.getCoordinateSequence, sb)
    sb.append(')')
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(",(")
      coordSeq(p.getInteriorRingN(i).getCoordinateSequence, sb)
      sb.append(')')
      i += 1
    }
    sb.append(')')
  }

  private def writeWkt(g: Geometry, sb: StringBuilder): Unit = g match {
    case p: Point =>
      if (p.isEmpty) sb.append("POINT EMPTY")
      else {
        sb.append("POINT(")
        sb.append(Num.rust(p.getX)).append(' ').append(Num.rust(p.getY))
        sb.append(')')
      }
    case ls: LineString =>
      if (ls.isEmpty) sb.append("LINESTRING EMPTY")
      else { sb.append("LINESTRING("); coordSeq(ls.getCoordinateSequence, sb); sb.append(')') }
    case p: Polygon =>
      if (p.isEmpty) sb.append("POLYGON EMPTY")
      else { sb.append("POLYGON"); polyBody(p, sb) }
    case mp: MultiPoint =>
      if (mp.isEmpty) sb.append("MULTIPOINT EMPTY")
      else {
        sb.append("MULTIPOINT(")
        var i = 0
        while (i < mp.getNumGeometries) {
          if (i > 0) sb.append(',')
          val pt = mp.getGeometryN(i).asInstanceOf[Point]
          sb.append('(').append(Num.rust(pt.getX)).append(' ').append(Num.rust(pt.getY)).append(')')
          i += 1
        }
        sb.append(')')
      }
    case mls: MultiLineString =>
      if (mls.isEmpty) sb.append("MULTILINESTRING EMPTY")
      else {
        sb.append("MULTILINESTRING(")
        var i = 0
        while (i < mls.getNumGeometries) {
          if (i > 0) sb.append(',')
          sb.append('(')
          coordSeq(mls.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence, sb)
          sb.append(')')
          i += 1
        }
        sb.append(')')
      }
    case mp: MultiPolygon =>
      if (mp.isEmpty) sb.append("MULTIPOLYGON EMPTY")
      else {
        sb.append("MULTIPOLYGON(")
        var i = 0
        while (i < mp.getNumGeometries) {
          if (i > 0) sb.append(',')
          polyBody(mp.getGeometryN(i).asInstanceOf[Polygon], sb)
          i += 1
        }
        sb.append(')')
      }
    case gc: GeometryCollection =>
      if (gc.isEmpty) sb.append("GEOMETRYCOLLECTION EMPTY")
      else {
        sb.append("GEOMETRYCOLLECTION(")
        var i = 0
        while (i < gc.getNumGeometries) {
          if (i > 0) sb.append(',')
          writeWkt(gc.getGeometryN(i), sb)
          i += 1
        }
        sb.append(')')
      }
  }

  // ---- GeoJSON ----
  final class GeoJsonException(msg: String) extends Exception(msg)

  private def jCoord(v: JValue): Coordinate = v match {
    case JArray(items) if items.length >= 2 =>
      new Coordinate(jNum(items(0)), jNum(items(1)))
    case _ => throw new GeoJsonException("bad coordinate")
  }
  private def jNum(v: JValue): Double = v match {
    case JLong(l)   => l.toDouble
    case JDouble(d) => d
    case _          => throw new GeoJsonException("expected number")
  }
  private def jArr(v: JValue): Vector[JValue] = v match {
    case JArray(items) => items
    case _             => throw new GeoJsonException("expected array")
  }
  private def ring(v: JValue): LinearRing =
    factory.createLinearRing(jArr(v).map(jCoord).toArray)

  /** GeoJSON geometry object → JTS. */
  def geometryFromJson(o: JObject): Geometry = {
    val t = o.fields.get("type") match {
      case Some(JString(s)) => s
      case _                => throw new GeoJsonException("geometry missing type")
    }
    def coords: JValue =
      o.fields.getOrElse("coordinates", throw new GeoJsonException("missing coordinates"))
    t match {
      case "Point"      => factory.createPoint(jCoord(coords))
      case "MultiPoint" => factory.createMultiPointFromCoords(jArr(coords).map(jCoord).toArray)
      case "LineString" => factory.createLineString(jArr(coords).map(jCoord).toArray)
      case "MultiLineString" =>
        factory.createMultiLineString(
          jArr(coords).map(l => factory.createLineString(jArr(l).map(jCoord).toArray)).toArray)
      case "Polygon" => polygonFromRings(jArr(coords))
      case "MultiPolygon" =>
        factory.createMultiPolygon(jArr(coords).map(p => polygonFromRings(jArr(p))).toArray)
      case "GeometryCollection" =>
        val geoms = o.fields.get("geometries") match {
          case Some(JArray(gs)) => gs
          case _                => throw new GeoJsonException("missing geometries")
        }
        factory.createGeometryCollection(geoms.map {
          case go: JObject => geometryFromJson(go)
          case _           => throw new GeoJsonException("bad geometry in collection")
        }.toArray)
      case other => throw new GeoJsonException(s"unsupported geometry type: $other")
    }
  }

  private def polygonFromRings(rings: Vector[JValue]): Polygon = {
    if (rings.isEmpty) return factory.createPolygon()
    val shell = ring(rings.head)
    val holes = rings.tail.map(ring).toArray
    factory.createPolygon(shell, holes)
  }

  /** JTS → canonical GeoJSON geometry JValue. */
  def geometryToJson(g: Geometry): JObject = {
    def cs(seq: CoordinateSequence): JArray =
      JArray((0 until seq.size()).map(i =>
        JArray(Vector(JDouble(seq.getX(i)), JDouble(seq.getY(i))))).toVector)
    def polyCoords(p: Polygon): JArray = {
      val rings = Vector(cs(p.getExteriorRing.getCoordinateSequence)) ++
        (0 until p.getNumInteriorRing).map(i => cs(p.getInteriorRingN(i).getCoordinateSequence))
      JArray(rings.map(identity))
    }
    g match {
      case p: Point =>
        JObject.of("coordinates" -> JArray(Vector(JDouble(p.getX), JDouble(p.getY))),
          "type" -> JString("Point"))
      case mp: MultiPoint =>
        JObject.of("coordinates" -> JArray((0 until mp.getNumGeometries).map { i =>
          val p = mp.getGeometryN(i).asInstanceOf[Point]
          JArray(Vector(JDouble(p.getX), JDouble(p.getY))): JValue
        }.toVector), "type" -> JString("MultiPoint"))
      case ls: LineString =>
        JObject.of("coordinates" -> cs(ls.getCoordinateSequence), "type" -> JString("LineString"))
      case mls: MultiLineString =>
        JObject.of("coordinates" -> JArray((0 until mls.getNumGeometries).map(i =>
          cs(mls.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence): JValue).toVector),
          "type" -> JString("MultiLineString"))
      case p: Polygon =>
        JObject.of("coordinates" -> polyCoords(p), "type" -> JString("Polygon"))
      case mp: MultiPolygon =>
        JObject.of("coordinates" -> JArray((0 until mp.getNumGeometries).map(i =>
          polyCoords(mp.getGeometryN(i).asInstanceOf[Polygon]): JValue).toVector),
          "type" -> JString("MultiPolygon"))
      case gc: GeometryCollection =>
        JObject.of("geometries" -> JArray((0 until gc.getNumGeometries).map(i =>
          geometryToJson(gc.getGeometryN(i)): JValue).toVector),
          "type" -> JString("GeometryCollection"))
    }
  }

  def geometryJsonString(g: Geometry): String = Json.write(geometryToJson(g))

  /** Canonical GeoJSON Feature string: `{"geometry":…,"properties":{…},"type":"Feature"}`
    * (bbox/id omitted, reference `src/geoq/entity.rs:172-182`). */
  def featureJsonString(g: Geometry, props: JObject): String =
    Json.write(JObject.of(
      "geometry" -> geometryToJson(g),
      "properties" -> props,
      "type" -> JString("Feature")))

  /** Feature with an embedded `bbox:[minx,miny,maxx,maxy]` member
    * (`geoq bbox --embed`, reference `commands/bbox.rs:37-42`); serde_json
    * maps serialize alphabetically, so bbox leads. */
  def featureJsonStringBbox(g: Geometry, props: JObject): String = {
    val (minX, minY, maxX, maxY) = bbox(g)
    Json.write(JObject.of(
      "bbox" -> JArray(Vector(JDouble(minX), JDouble(minY), JDouble(maxX), JDouble(maxY))),
      "geometry" -> geometryToJson(g),
      "properties" -> props,
      "type" -> JString("Feature")))
  }
}
