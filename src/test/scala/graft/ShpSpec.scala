package graft

import graft.sources.ShpIO
import org.scalatest.funsuite.AnyFunSuite

/** Shapefile reader against the reference's own fixtures
  * (`/root/reference/tests/resources/poly.shp|.dbf`, `line.shp`). */
class ShpSpec extends AnyFunSuite {

  test("poly.shp: 10 polygons with dBase properties") {
    val fs = ShpIO.read("/root/reference/tests/resources/poly.shp")
    assert(fs.size == 10)
    assert(fs.forall(_.geomType == "Polygon"))
    val p0 = fs.head.props.fields
    assert(p0("AREA") == graft.geom.JDouble(215229.266))
    assert(p0("EAS_ID") == graft.geom.JDouble(168.0))
    assert(p0("PRFEDEA") == graft.geom.JString("35043411"))
    // every 2D conversion yields a valid JTS polygon containing its centroid
    fs.foreach { f =>
      val g = ShpIO.toJts(f)
      assert(g.getGeometryType == "Polygon")
      assert(g.getNumPoints >= 4)
    }
    // feature line shape matches the reference's serde output structure
    val line = ShpIO.featureJson(fs.head)
    assert(line.startsWith("""{"geometry":{"coordinates":[[["""))
    assert(line.endsWith(""","type":"Feature"}"""))
    assert(line.contains(""""properties":{"AREA":215229.266,"EAS_ID":168.0,"PRFEDEA":"35043411"}"""))
  }

  test("PolylineZ with OPTIONAL M block absent reads NO_DATA, not garbage") {
    // synthesize a one-record .shp: PolylineZ (type 13), 1 part, 2 points,
    // WITH Z block but WITHOUT the optional M block (ESRI spec allows this);
    // then the same record WITH an M block. The M-less read must not run
    // past the record into trailing bytes.
    import java.nio.{ByteBuffer, ByteOrder}
    def mkShp(withM: Boolean): java.nio.file.Path = {
      val n = 2
      val contentBytes = 4 + 32 + 4 + 4 + 4 + 16 * n + (16 + 8 * n) +
        (if (withM) 16 + 8 * n else 0)
      val total = 100 + 8 + contentBytes
      val bb = ByteBuffer.allocate(total)
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0, 9994)                      // file code
      bb.putInt(24, total / 2)                // file length in words
      bb.order(ByteOrder.LITTLE_ENDIAN).putInt(32, 1000).putInt(36, 13)
      bb.order(ByteOrder.BIG_ENDIAN).putInt(100, 1).putInt(104, contentBytes / 2)
      val le = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      var p = 108
      le.putInt(p, 13); p += 4                // shape type
      p += 32                                 // bbox (zeros fine)
      le.putInt(p, 1); p += 4                 // numParts
      le.putInt(p, n); p += 4                 // numPoints
      le.putInt(p, 0); p += 4                 // part start
      le.putDouble(p, 1.5); le.putDouble(p + 8, 2.5); p += 16
      le.putDouble(p, 3.5); le.putDouble(p + 8, 4.5); p += 16
      le.putDouble(p, 10.0); le.putDouble(p + 8, 20.0); p += 16 // z min/max
      le.putDouble(p, 10.0); le.putDouble(p + 8, 20.0); p += 16 // z values
      if (withM) {
        le.putDouble(p, 7.0); le.putDouble(p + 8, 8.0); p += 16 // m min/max
        le.putDouble(p, 7.0); le.putDouble(p + 8, 8.0); p += 16 // m values
      }
      val f = java.nio.file.Files.createTempFile("optm", ".shp")
      java.nio.file.Files.write(f, bb.array())
      f
    }
    val noM = ShpIO.read(mkShp(withM = false).toString)
    assert(noM.size == 1 && noM.head.geomType == "MultiLineString")
    // [x, y, m, z] quirk order; m = NO_DATA sentinel when the block is absent
    assert(ShpIO.featureJson(noM.head).contains(
      "[1.5,2.5,-1000000000000000000000000000000000000000.0,10.0]"),
      ShpIO.featureJson(noM.head))
    val withM = ShpIO.read(mkShp(withM = true).toString)
    assert(ShpIO.featureJson(withM.head).contains("[1.5,2.5,7.0,10.0]"),
      ShpIO.featureJson(withM.head))
    assert(ShpIO.featureJson(withM.head).contains("[3.5,4.5,8.0,20.0]"))
  }

  test("line.shp (no .dbf): multiline parts, empty properties") {
    val fs = ShpIO.read("/root/reference/tests/resources/line.shp")
    assert(fs.size == 1)
    val f = fs.head
    assert(f.geomType == "MultiLineString")
    assert(ShpIO.featureJson(f) ==
      """{"geometry":{"coordinates":[[[1.0,5.0],[5.0,5.0],[5.0,1.0],[3.0,3.0],[1.0,1.0]],[[3.0,2.0],[2.0,6.0]]],"type":"MultiLineString"},"properties":{},"type":"Feature"}""")
    assert(ShpIO.toJts(f).getGeometryType == "MultiLineString")
  }
}
