package graft

import graft.core.Entity
import graft.ops.GeoOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline goldens: the reference CLI's exact stdin→stdout pairs
  * replayed through the distributed Dataset path with order restoration —
  * the automated form of the manual `bin/geoq-spark` drives
  * (`tests/cli_test.rs` line refs on each case).
  */
class PipelineGoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val mixedInput: Seq[String] = Seq(
    "12,34",
    "12\t34",
    "9q5",
    "LINESTRING (30 10, 10 30, 40 40)",
    """{"type":"Point","coordinates":[125.6, 10.1]}""",
    """{"type":"Feature","properties":{"a": "b"},"geometry":{"type":"Point","coordinates":[125.6, 10.1]}}""",
    """{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[34.0,12.0]}},{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[78.0,56.0]}}]}""")

  def feats = GeoOps.parseStrings(spark, mixedInput)

  test("wkt golden (cli_test.rs:52-77)") {
    assert(GeoOps.collectOrdered(GeoOps.wkt(feats)) == Seq(
      "POINT(34 12)",
      "POINT(34 12)",
      "POLYGON((-119.53125 33.75,-118.125 33.75,-118.125 35.15625,-119.53125 35.15625,-119.53125 33.75))",
      "LINESTRING(30 10,10 30,40 40)",
      "POINT(125.6 10.1)",
      "POINT(125.6 10.1)",
      "POINT(34 12)",
      "POINT(78 56)"))
  }

  test("gj geom golden (cli_test.rs:80-105)") {
    assert(GeoOps.collectOrdered(GeoOps.gjGeom(feats)) == Seq(
      """{"coordinates":[34.0,12.0],"type":"Point"}""",
      """{"coordinates":[34.0,12.0],"type":"Point"}""",
      """{"coordinates":[[[-119.53125,33.75],[-118.125,33.75],[-118.125,35.15625],[-119.53125,35.15625],[-119.53125,33.75]]],"type":"Polygon"}""",
      """{"coordinates":[[30.0,10.0],[10.0,30.0],[40.0,40.0]],"type":"LineString"}""",
      """{"coordinates":[125.6,10.1],"type":"Point"}""",
      """{"coordinates":[125.6,10.1],"type":"Point"}""",
      """{"coordinates":[34.0,12.0],"type":"Point"}""",
      """{"coordinates":[78.0,56.0],"type":"Point"}"""))
  }

  test("gj f golden (cli_test.rs:108-133)") {
    val out = GeoOps.collectOrdered(GeoOps.gjFeature(feats))
    assert(out(5) == """{"geometry":{"coordinates":[125.6,10.1],"type":"Point"},"properties":{"a":"b"},"type":"Feature"}""")
    assert(out(0) == """{"geometry":{"coordinates":[34.0,12.0],"type":"Point"},"properties":{},"type":"Feature"}""")
    assert(out.size == 8)
  }

  test("gj fc golden (cli_test.rs:136-152)") {
    val input = mixedInput.take(6)
    val fc = GeoOps.gjFeatureCollection(GeoOps.parseStrings(spark, input))
    assert(fc == """{"features":[{"geometry":{"coordinates":[34.0,12.0],"type":"Point"},"properties":{},"type":"Feature"},{"geometry":{"coordinates":[34.0,12.0],"type":"Point"},"properties":{},"type":"Feature"},{"geometry":{"coordinates":[[[-119.53125,33.75],[-118.125,33.75],[-118.125,35.15625],[-119.53125,35.15625],[-119.53125,33.75]]],"type":"Polygon"},"properties":{},"type":"Feature"},{"geometry":{"coordinates":[[30.0,10.0],[10.0,30.0],[40.0,40.0]],"type":"LineString"},"properties":{},"type":"Feature"},{"geometry":{"coordinates":[125.6,10.1],"type":"Point"},"properties":{},"type":"Feature"},{"geometry":{"coordinates":[125.6,10.1],"type":"Point"},"properties":{"a":"b"},"type":"Feature"}],"type":"FeatureCollection"}""")
  }

  test("read labels golden (cli_test.rs:6-26)") {
    assert(GeoOps.collectOrdered(GeoOps.readLabels(
      GeoOps.parseStrings(spark, mixedInput.take(5)))) == Seq(
      "LatLon: 12,34",
      "LatLon: 12\t34",
      "Geohash: 9q5",
      "WKT: LINESTRING(30 10,10 30,40 40)",
      "GeoJSON Geometry: {\"type\":\"Point\",\"coordinates\":[125.6, 10.1]}"))
  }

  test("gh point 7 golden (cli_test.rs:155-171)") {
    assert(GeoOps.collectOrdered(GeoOps.ghPoint(
      GeoOps.parseStrings(spark, Seq("12,34", "12\t34", "34,-118")), 7)) ==
      Seq("sf0hm8w", "sf0hm8w", "9qh16ve"))
  }

  test("gh covering 3 -o golden order (cli_test.rs:294-472, first entities)") {
    val out = GeoOps.collectOrdered(GeoOps.ghCovering(
      GeoOps.parseStrings(spark, Seq("12,34", "9q5")), 3, echo = true))
    assert(out == Seq("12,34", "sf0",
      "9q5", "9qk", "9qh", "9q7", "9q6", "9q5", "9q4", "9mu", "9mg", "9mf"))
  }

  test("filter intersects golden keep/drop with raw echo (cli_test.rs:503-519)") {
    val input = Seq(
      "34.2277,-118.2623",
      """{"type":"Polygon","coordinates":[[[-117.87231445312499,34.77997173591062],[-117.69653320312499,34.77997173591062],[-117.69653320312499,34.90170042871546],[-117.87231445312499,34.90170042871546],[-117.87231445312499,34.77997173591062]]]}""",
      """{"type":"Polygon","coordinates":[[[-118.27880859375001,34.522398580663314],[-117.89154052734375,34.522398580663314],[-117.89154052734375,34.649025753526985],[-118.27880859375001,34.649025753526985],[-118.27880859375001,34.522398580663314]]]}""")
    import spark.implicits._
    val kept = GeoOps.filterIntersects(
      GeoOps.parseStrings(spark, input), Entity.parseLine("9q5").map(_.geom))
      .map(f => (f.rowId, f.subIdx, f.raw))
    assert(GeoOps.collectOrdered(kept) == Seq(input(0), input(2)))

    val negated = GeoOps.filterIntersects(
      GeoOps.parseStrings(spark, input), Entity.parseLine("9q5").map(_.geom), negate = true)
      .map(f => (f.rowId, f.subIdx, f.raw))
    assert(GeoOps.collectOrdered(negated) == Seq(input(1)))
  }

  test("filter intersects --query-file golden (cli_test.rs:522-545, reference resource)") {
    // queries come from the reference's OWN resource file (geohash line +
    // polygon line, union-of-queries semantics)
    val queryLines = scala.io.Source.fromFile(
      "/root/reference/tests/resources/query_file.txt").getLines().toSeq
    val queries = queryLines.filter(_.nonEmpty).flatMap(l => Entity.parseLine(l)).map(_.geom)
    val input = Seq(
      "34.2277,-118.2623",
      """{"type":"Polygon","coordinates":[[[-117.87231445312499,34.77997173591062],[-117.69653320312499,34.77997173591062],[-117.69653320312499,34.90170042871546],[-117.87231445312499,34.90170042871546],[-117.87231445312499,34.77997173591062]]]}""",
      """{"type":"Polygon","coordinates":[[[-118.27880859375001,34.522398580663314],[-117.89154052734375,34.522398580663314],[-117.89154052734375,34.649025753526985],[-118.27880859375001,34.649025753526985],[-118.27880859375001,34.522398580663314]]]}""")
    import spark.implicits._
    val kept = GeoOps.filterIntersects(GeoOps.parseStrings(spark, input), queries)
      .map(f => (f.rowId, f.subIdx, f.raw))
    assert(GeoOps.collectOrdered(kept) == Seq(input(0), input(2)))
  }

  test("filter contains --query-file golden (cli_test.rs:636-660, reference resource)") {
    val queryLines = scala.io.Source.fromFile(
      "/root/reference/tests/resources/query_file.txt").getLines().toSeq
    val queries = queryLines.filter(_.nonEmpty).flatMap(l => Entity.parseLine(l)).map(_.geom)
    val input = Seq(
      """{"type": "LineString", "coordinates": [[-44.2529296875, 25.3241665257384], [-42.802734375, 25.502784548755354]]}""",
      """{"type": "LineString", "coordinates": [[-45.41748046875, 24.186847428521244], [-45, 22.004174972902003]]}""",
      """{"type": "Point", "coordinates": [-47.4609375, 21.453068633086783]}""")
    import spark.implicits._
    val kept = GeoOps.filterContains(GeoOps.parseStrings(spark, input), queries)
      .map(f => (f.rowId, f.subIdx, f.raw))
    assert(GeoOps.collectOrdered(kept) == Seq(input(1), input(2)))
  }

  test("geojson feature with missing or null properties parses (cli_test.rs:562-575)") {
    val input = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[125.6, 10.1]}}""",
      """{"type":"Feature","properties":null,"geometry":{"type":"Point","coordinates":[125.6, 10.1]}}""")
    assert(GeoOps.collectOrdered(GeoOps.wkt(GeoOps.parseStrings(spark, input))) ==
      Seq("POINT(125.6 10.1)", "POINT(125.6 10.1)"))
  }

  test("gh point rejects non-point input (cli_test.rs:503-510 error contract)") {
    val ex = intercept[org.apache.spark.SparkException] {
      GeoOps.collectOrdered(GeoOps.ghPoint(
        GeoOps.parseStrings(spark, Seq("LINESTRING (30 10, 10 30, 40 40)")), 7))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.contains("non-point") || m.contains("NotImplemented")))
  }

  test("invalid input fails the job (reference fail-fast, par.rs:136-139)") {
    val ex = intercept[org.apache.spark.SparkException] {
      GeoOps.wkt(GeoOps.parseStrings(spark, Seq("12,34", "pizza"))).collect()
    }
    assert(ex.getMessage.contains("Unable to parse single-line input") ||
      Option(ex.getCause).exists(_.getMessage.contains("Unable to parse single-line input")))
  }
}
