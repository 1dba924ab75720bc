package graft.sources

import com.google.flatbuffers.FlatBufferBuilder
import graft.core.GeoqException
import graft.geom._
import graft.index.Hilbert
import graft.ops.PackedRTree
import org.locationtech.jts.geom._
import java.nio.{ByteBuffer, ByteOrder}

/** FlatGeobuf binary file writer + reader — the reference's `fgb write` /
  * `fgb read [--bbox]` (`/root/reference/src/geoq/fgb/mod.rs:37-77`,
  * `commands/fgb.rs:44-72`).
  *
  * Layout: magic `66 67 62 03 66 67 62 00` ‖ size-prefixed Header
  * flatbuffer ‖ packed Hilbert R-tree (40-byte nodes) ‖ size-prefixed
  * Feature flatbuffers. The flatbuffers are hand-rolled against the
  * published FlatGeobuf schema (header.fbs / feature.fbs slot numbers) via
  * flatbuffers-java's low-level table API — no generated code exists
  * offline. Deliberate deviation, documented in FIXTURES.md: the reference
  * iterates a HashMap for column order (`fgb/header.rs:72`, nondeterministic
  * run-to-run); columns here are sorted by name.
  *
  * Engine scale note: this is the reference-format interchange SINK, a
  * driver-side artifact like `gj fc`. The 100 TB layout analog is the
  * hilbert-clustered parquet table (TableIO) where row-group min/max stats
  * play the R-tree's role.
  */
object FgbIO {

  val MAGIC: Array[Byte] = Array(0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00).map(_.toByte)

  // FlatGeobuf GeometryType ordinals
  private val GT: Map[String, Byte] = Map(
    "Point" -> 1, "LineString" -> 2, "Polygon" -> 3, "MultiPoint" -> 4,
    "MultiLineString" -> 5, "MultiPolygon" -> 6, "GeometryCollection" -> 7)

  // FlatGeobuf ColumnType ordinals for the reference's inferred types
  private val COL_BOOL: Byte = 2
  private val COL_LONG: Byte = 7
  private val COL_DOUBLE: Byte = 10
  private val COL_STRING: Byte = 11
  private val COL_JSON: Byte = 12

  final case class ColSpec(name: String, colType: Byte)
  final case class Fgb(columns: Seq[ColSpec], featuresCount: Long, indexNodeSize: Int,
                       envelope: Seq[Double], geometryType: Byte,
                       meta: PackedRTree.Meta, tree: Array[PackedRTree.Node],
                       featureBytes: Array[Byte])

  // ------------------------------------------------------------------ write

  /** Serialize features (geometry + properties) to FGB bytes: hilbert sort
    * with running extent, widened column schema, header, R-tree, features. */
  def write(features: Seq[(Geometry, JObject)]): Array[Byte] = {
    if (features.isEmpty) throw GeoqException("NoInputGiven")
    // extent + hilbert sort (reference fgb/hilbert.rs:211-233; stable sort)
    val boxed = features.map { case (g, p) => (Geo.bbox(g), g, p) }
    val minX = boxed.map(_._1._1).min
    val minY = boxed.map(_._1._2).min
    val maxX = boxed.map(_._1._3).max
    val maxY = boxed.map(_._1._4).max
    val sorted = boxed.sortBy { case ((bMinX, bMinY, bMaxX, bMaxY), _, _) =>
      Hilbert.hilbertBbox((bMinX + bMaxX) / 2.0, (bMinY + bMaxY) / 2.0, minX, minY, maxX, maxY)
    }

    // widened schema (SchemaUnion lattice), columns sorted by name
    val schema = sorted.foldLeft(Map.empty[String, String]) { case (m, (_, _, props)) =>
      graft.ops.SchemaUnion.mergeMaps(m,
        props.fields.flatMap { case (k, v) => graft.ops.SchemaUnion.of(v).map(t => k -> t.name) })
    }
    val cols = schema.toSeq.sortBy(_._1).map { case (name, t) =>
      ColSpec(name, t match {
        case "boolean" => COL_BOOL
        case "long" => COL_LONG
        case "double" => COL_DOUBLE
        case "string" => COL_STRING
        case _ => COL_JSON
      })
    }

    // geometry_type: the single type if homogeneous, else Unknown (header.rs:28-54)
    val types = sorted.map(f => GT.getOrElse(f._2.getGeometryType,
      throw GeoqException(s"fgb: unsupported geometry ${f._2.getGeometryType}"))).distinct
    val geomType: Byte = if (types.size == 1) types.head else 0

    // features to a temp buffer, recording byte offsets for the index
    val featBuf = new java.io.ByteArrayOutputStream()
    val leaves = sorted.map { case ((bMinX, bMinY, bMaxX, bMaxY), g, props) =>
      val node = PackedRTree.Node(bMinX, bMinY, bMaxX, bMaxY, featBuf.size().toLong)
      featBuf.write(featureBytes(g, props, cols))
      node
    }
    val (_, tree) = PackedRTree.build(leaves.toIndexedSeq)

    val out = new java.io.ByteArrayOutputStream()
    out.write(MAGIC)
    out.write(headerBytes(sorted.size.toLong, geomType, cols, Seq(minX, minY, maxX, maxY)))
    out.write(PackedRTree.serialize(tree))
    featBuf.writeTo(out)
    out.toByteArray
  }

  /** Size-prefixed Header flatbuffer (header.fbs slots: name=0, envelope=1,
    * geometry_type=2, columns=7, features_count=8, index_node_size=9). */
  private def headerBytes(nFeatures: Long, geomType: Byte, cols: Seq[ColSpec],
                          envelope: Seq[Double]): Array[Byte] = {
    val b = new FlatBufferBuilder(1024)
    val nameOff = b.createString("L1")
    val colOffs = cols.map { c =>
      val n = b.createString(c.name)
      b.startTable(11)
      b.addOffset(0, n, 0)
      b.addByte(1, c.colType, 0)
      b.addBoolean(7, true, true) // nullable (fbs default true → elided)
      b.endTable()
    }
    val colsVec = b.createVectorOfTables(colOffs.toArray)
    b.startVector(8, envelope.size, 8)
    envelope.reverse.foreach(b.addDouble)
    val envVec = b.endVector()
    b.startTable(14)
    b.addOffset(0, nameOff, 0)
    b.addOffset(1, envVec, 0)
    b.addByte(2, geomType, 0)
    b.addOffset(7, colsVec, 0)
    b.addLong(8, nFeatures, 0)
    b.addShort(9, PackedRTree.NODE_SIZE.toShort, 16)
    b.finishSizePrefixed(b.endTable())
    b.sizedByteArray()
  }

  /** Size-prefixed Feature flatbuffer (feature.fbs: geometry=0, properties=1). */
  private def featureBytes(g: Geometry, props: JObject, cols: Seq[ColSpec]): Array[Byte] = {
    val b = new FlatBufferBuilder(1024)
    val geomOff = buildGeometry(b, g)
    val propBytes = propsBytes(props, cols)
    val propsOff = if (propBytes.isEmpty) 0 else b.createByteVector(propBytes)
    b.startTable(3)
    b.addOffset(0, geomOff, 0)
    if (propsOff != 0) b.addOffset(1, propsOff, 0)
    b.finishSizePrefixed(b.endTable())
    b.sizedByteArray()
  }

  /** Geometry table (geometry.fbs slots: ends=0, xy=1, type=6, parts=7),
    * mirroring the reference's encoding (`fgb/geometry.rs:115-211`): flat xy
    * pairs; ends = cumulative ring coord counts, omitted for single rings;
    * MultiPolygon/GeometryCollection via nested parts with empty xy. */
  private def buildGeometry(b: FlatBufferBuilder, g: Geometry): Int = {
    def rings(p: Polygon): Seq[Seq[Coordinate]] =
      (p.getExteriorRing +: (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(_.getCoordinates.toSeq)
    def flat(coordSeqs: Seq[Seq[Coordinate]]): (Array[Double], Option[Array[Int]]) = {
      val xy = coordSeqs.flatten.flatMap(c => Seq(c.x, c.y)).toArray
      val ends = if (coordSeqs.size > 1) {
        var n = 0
        Some(coordSeqs.map { r => n += r.size; n }.toArray)
      } else None
      (xy, ends)
    }
    val (xy, ends, parts, gt) = g match {
      case p: Point => (Array(p.getX, p.getY), None, None, GT("Point"))
      case ls: LineString => (flat(Seq(ls.getCoordinates.toSeq))._1, None, None, GT("LineString"))
      case mp: MultiPoint =>
        (mp.getCoordinates.flatMap(c => Seq(c.x, c.y)), None, None, GT("MultiPoint"))
      case poly: Polygon =>
        val (f, e) = flat(rings(poly)); (f, e, None, GT("Polygon"))
      case mls: MultiLineString =>
        val lines = (0 until mls.getNumGeometries).map(i =>
          mls.getGeometryN(i).getCoordinates.toSeq)
        val (f, e) = flat(lines); (f, e, None, GT("MultiLineString"))
      case mpoly: MultiPolygon =>
        val ps = (0 until mpoly.getNumGeometries).map(i => mpoly.getGeometryN(i))
        (Array.empty[Double], None, Some(ps), GT("MultiPolygon"))
      case gc: GeometryCollection =>
        val ps = (0 until gc.getNumGeometries).map(i => gc.getGeometryN(i))
        (Array.empty[Double], None, Some(ps), GT("GeometryCollection"))
      case other => throw GeoqException(s"fgb: unsupported geometry ${other.getGeometryType}")
    }
    val partOffs = parts.map(ps => ps.map(p => buildGeometry(b, p)).toArray)
    val partsVec = partOffs.map(b.createVectorOfTables)
    b.startVector(8, xy.length, 8)
    xy.reverse.foreach(b.addDouble)
    val xyVec = b.endVector()
    val endsVec = ends.map { e =>
      b.startVector(4, e.length, 4)
      e.reverse.foreach(b.addInt)
      b.endVector()
    }
    b.startTable(8)
    endsVec.foreach(v => b.addOffset(0, v, 0))
    b.addOffset(1, xyVec, 0)
    b.addByte(6, gt, 0)
    partsVec.foreach(v => b.addOffset(7, v, 0))
    b.endTable()
  }

  /** Per-feature property buffer: (u16 LE column index, value) pairs in
    * column order; nulls/missing omitted; strings/json u32-length-prefixed
    * (`fgb/properties.rs:24-114`). */
  private def propsBytes(props: JObject, cols: Seq[ColSpec]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xFF); bb.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = (0 until 4).foreach(i => bb.write((v >> (8 * i)) & 0xFF))
    def le64(v: Long): Unit = (0 until 8).foreach(i => bb.write(((v >> (8 * i)) & 0xFF).toInt))
    def str(s: String): Unit = {
      val bytes = s.getBytes("UTF-8")
      le32(bytes.length); bb.write(bytes)
    }
    cols.zipWithIndex.foreach { case (col, idx) =>
      props.fields.get(col.name) match {
        case None | Some(JNull) => // omitted
        case Some(v) =>
          le16(idx)
          (col.colType, v) match {
            case (COL_BOOL, JBool(x))     => bb.write(if (x) 1 else 0)
            case (COL_LONG, JLong(x))     => le64(x)
            case (COL_DOUBLE, JDouble(x)) => le64(java.lang.Double.doubleToLongBits(x))
            case (COL_DOUBLE, JLong(x))   => le64(java.lang.Double.doubleToLongBits(x.toDouble))
            case (COL_STRING, JString(x)) => str(x)
            case (COL_JSON, jv)           => str(Json.write(jv))
            case (t, jv) => throw GeoqException(s"fgb: column ${col.name} type $t got $jv")
          }
      }
    }
    bb.toByteArray
  }

  // ------------------------------------------------------------------- read

  /** Minimal flatbuffer table navigation (vtable lookup). */
  private final class Tbl(val bb: ByteBuffer, val pos: Int) {
    private val vt = pos - bb.getInt(pos)
    private val vtSize = bb.getShort(vt)
    private def fieldOff(slot: Int): Int = {
      val vo = 4 + 2 * slot
      if (vo >= vtSize) 0
      else {
        val fo = bb.getShort(vt + vo)
        if (fo == 0) 0 else pos + fo
      }
    }
    def byteField(slot: Int, d: Byte): Byte = {
      val o = fieldOff(slot); if (o == 0) d else bb.get(o)
    }
    def shortField(slot: Int, d: Short): Short = {
      val o = fieldOff(slot); if (o == 0) d else bb.getShort(o)
    }
    def longField(slot: Int, d: Long): Long = {
      val o = fieldOff(slot); if (o == 0) d else bb.getLong(o)
    }
    /** Start of a vector's elements and its length, or null. */
    def vector(slot: Int): Option[(Int, Int)] = {
      val o = fieldOff(slot)
      if (o == 0) None
      else {
        val v = o + bb.getInt(o)
        Some((v + 4, bb.getInt(v)))
      }
    }
    def stringField(slot: Int): Option[String] = vector(slot).map { case (at, len) =>
      val a = new Array[Byte](len)
      val dup = bb.duplicate(); dup.position(at); dup.get(a)
      new String(a, "UTF-8")
    }
    def tableField(slot: Int): Option[Tbl] = {
      val o = fieldOff(slot)
      if (o == 0) None else Some(new Tbl(bb, o + bb.getInt(o)))
    }
    def tableVector(slot: Int): Seq[Tbl] = vector(slot) match {
      case None => Nil
      case Some((at, len)) =>
        (0 until len).map { i =>
          val p = at + 4 * i
          new Tbl(bb, p + bb.getInt(p))
        }
    }
  }

  /** Parse an FGB byte array: header, index, features. */
  def read(bytes: Array[Byte]): Fgb = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (!bytes.take(8).sameElements(MAGIC)) throw GeoqException("fgb: bad magic bytes")
    val headerLen = bb.getInt(8)
    val header = new Tbl(bb, 12 + bb.getInt(12))
    val nFeatures = header.longField(8, 0)
    val nodeSize = header.shortField(9, 16).toInt
    val geomType = header.byteField(2, 0)
    val envelope = header.vector(1) match {
      case Some((at, len)) => (0 until len).map(i => bb.getDouble(at + 8 * i))
      case None => Nil
    }
    val cols = header.tableVector(7).map { c =>
      ColSpec(c.stringField(0).getOrElse(""), c.byteField(1, 0))
    }
    val meta = PackedRTree.levelBounds(nFeatures.toInt, nodeSize)
    val indexStart = 12 + headerLen
    val tree = new Array[PackedRTree.Node](meta.numNodes)
    var i = 0
    while (i < meta.numNodes) {
      val p = indexStart + i * PackedRTree.NODE_STORAGE_BYTES
      tree(i) = PackedRTree.Node(bb.getDouble(p), bb.getDouble(p + 8),
        bb.getDouble(p + 16), bb.getDouble(p + 24), bb.getLong(p + 32))
      i += 1
    }
    val featStart = indexStart + meta.numNodes * PackedRTree.NODE_STORAGE_BYTES
    Fgb(cols, nFeatures, nodeSize, envelope, geomType, meta, tree,
      java.util.Arrays.copyOfRange(bytes, featStart, bytes.length))
  }

  /** Decode every feature (in file = hilbert order). */
  def features(fgb: Fgb): Seq[(Geometry, JObject)] = {
    val bb = ByteBuffer.wrap(fgb.featureBytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 0
    val out = Vector.newBuilder[(Geometry, JObject)]
    while (pos < fgb.featureBytes.length) {
      val len = bb.getInt(pos)
      out += decodeFeature(bb, pos + 4, fgb.columns)
      pos += 4 + len
    }
    out.result()
  }

  /** Features whose bbox intersects the query box, served by the R-tree
    * (the reference `fgb read --bbox`, `commands/fgb.rs:48-65`). */
  def bboxSelect(fgb: Fgb, minX: Double, minY: Double,
                 maxX: Double, maxY: Double): Seq[(Geometry, JObject)] = {
    val bb = ByteBuffer.wrap(fgb.featureBytes).order(ByteOrder.LITTLE_ENDIAN)
    val leafStart = fgb.meta.levelBounds.last.start
    PackedRTree.search(fgb.meta, fgb.tree, minX, minY, maxX, maxY).map { i =>
      val off = fgb.tree(leafStart + i).offset
      if (off < 0 || off > Int.MaxValue - 4)
        throw GeoqException(s"fgb: feature offset $off exceeds the 2 GiB in-memory payload limit")
      decodeFeature(bb, off.toInt + 4, fgb.columns)
    }
  }

  private def decodeFeature(bb: ByteBuffer, pos: Int, cols: Seq[ColSpec]): (Geometry, JObject) = {
    val t = new Tbl(bb, pos + bb.getInt(pos))
    val geom = t.tableField(0).map(decodeGeometry(_, 0))
      .getOrElse(throw GeoqException("fgb: feature without geometry"))
    val props = t.vector(1) match {
      case None => JObject.empty
      case Some((at, len)) => decodeProps(bb, at, len, cols)
    }
    (geom, props)
  }

  private def decodeGeometry(t: Tbl, outerType: Byte): Geometry = {
    val bb = t.bb
    val gt = { val x = t.byteField(6, 0); if (x != 0) x else outerType }
    val xy = t.vector(1) match {
      case Some((at, len)) => (0 until len).map(i => bb.getDouble(at + 8 * i)).toArray
      case None => Array.empty[Double]
    }
    val ends = t.vector(0) match {
      case Some((at, len)) => Some((0 until len).map(i => bb.getInt(at + 4 * i)).toArray)
      case None => None
    }
    def coords(from: Int, until: Int): Array[Coordinate] =
      (from until until).map(i => new Coordinate(xy(2 * i), xy(2 * i + 1))).toArray
    def ringSlices: Seq[Array[Coordinate]] = ends match {
      case None => Seq(coords(0, xy.length / 2))
      case Some(e) =>
        var start = 0
        e.toSeq.map { end => val r = coords(start, end); start = end; r }
    }
    val f = Geo.factory
    gt match {
      case 1 => f.createPoint(new Coordinate(xy(0), xy(1)))
      case 2 => f.createLineString(coords(0, xy.length / 2))
      case 3 =>
        val rs = ringSlices
        f.createPolygon(f.createLinearRing(rs.head),
          rs.tail.map(f.createLinearRing).toArray)
      case 4 => f.createMultiPointFromCoords(coords(0, xy.length / 2))
      case 5 => f.createMultiLineString(ringSlices.map(f.createLineString).toArray)
      case 6 =>
        val parts = t.tableVector(7).map(p => decodeGeometry(p, 3).asInstanceOf[Polygon])
        f.createMultiPolygon(parts.toArray)
      case 7 =>
        val parts = t.tableVector(7).map(p => decodeGeometry(p, 0))
        f.createGeometryCollection(parts.toArray)
      case other => throw GeoqException(s"fgb: unsupported geometry type $other")
    }
  }

  private def decodeProps(bb: ByteBuffer, at: Int, len: Int, cols: Seq[ColSpec]): JObject = {
    var pos = at
    val end = at + len
    var fields = scala.collection.immutable.TreeMap.empty[String, JValue]
    while (pos < end) {
      val idx = bb.getShort(pos) & 0xFFFF
      pos += 2
      val col = cols(idx)
      val v: JValue = col.colType match {
        case COL_BOOL => val x = bb.get(pos); pos += 1; JBool(x != 0)
        case COL_LONG => val x = bb.getLong(pos); pos += 8; JLong(x)
        case COL_DOUBLE => val x = bb.getDouble(pos); pos += 8; JDouble(x)
        case COL_STRING | COL_JSON =>
          val n = bb.getInt(pos); pos += 4
          val a = new Array[Byte](n)
          val dup = bb.duplicate(); dup.position(pos); dup.get(a)
          pos += n
          val s = new String(a, "UTF-8")
          if (col.colType == COL_JSON) Json.parse(s) else JString(s)
        case other => throw GeoqException(s"fgb: unsupported column type $other")
      }
      fields = fields.updated(col.name, v)
    }
    JObject(fields)
  }
}
