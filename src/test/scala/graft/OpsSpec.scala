package graft

import graft.core.GeoqException
import graft.geom.Geo
import graft.ops.{Munge, Simplify}
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for `json munge` (`tests/cli_test.rs:576-612`,
  * `src/geoq/commands/json.rs:217-272`) and properties for VW-preserve
  * simplify (no goldens exist in the reference — see Simplify scaladoc).
  */
class OpsSpec extends AnyFunSuite {

  // --- json munge goldens ---
  test("munge: latitude/longitude keys") {
    assert(Munge.mungeLine("""{"latitude": 34.3, "longitude": -118.2, "name": "Horace", "pizza": "pie"}""") ==
      """{"geometry":{"coordinates":[-118.2,34.3],"type":"Point"},"properties":{"name":"Horace","pizza":"pie"},"type":"Feature"}""")
  }
  test("munge: lat/lon keys") {
    assert(Munge.mungeLine("""{"lat": 34.3, "lon": -118.2, "name": "Horace", "pizza": "pie"}""") ==
      """{"geometry":{"coordinates":[-118.2,34.3],"type":"Point"},"properties":{"name":"Horace","pizza":"pie"},"type":"Feature"}""")
  }
  test("munge: latitude/lng keys") {
    assert(Munge.mungeLine("""{"latitude": 34.3, "lng": -118.2, "name": "Horace", "pizza": "pie"}""") ==
      """{"geometry":{"coordinates":[-118.2,34.3],"type":"Point"},"properties":{"name":"Horace","pizza":"pie"},"type":"Feature"}""")
  }
  test("munge: wkt string key") {
    assert(Munge.mungeLine("""{"name": "Horace", "pizza": "pie", "wkt":"POINT(-118.3991 33.9924)"}""") ==
      """{"geometry":{"coordinates":[-118.3991,33.9924],"type":"Point"},"properties":{"name":"Horace","pizza":"pie"},"type":"Feature"}""")
  }
  test("munge: numeric strings accepted for lat/lon") {
    assert(Munge.mungeLine("""{"lat": "34.3", "lon": "-118.2"}""") ==
      """{"geometry":{"coordinates":[-118.2,34.3],"type":"Point"},"properties":{},"type":"Feature"}""")
  }
  test("munge: geojson object under geometry key") {
    assert(Munge.mungeLine("""{"a":1,"geometry":{"type":"Point","coordinates":[1.5,2.5]}}""") ==
      """{"geometry":{"coordinates":[1.5,2.5],"type":"Point"},"properties":{"a":1},"type":"Feature"}""")
  }
  test("munge: errors") {
    intercept[GeoqException](Munge.mungeLine("pizza"))
    intercept[GeoqException](Munge.mungeLine("[\"not-json-object\"]"))
    intercept[GeoqException](Munge.mungeLine("{\"no-lat-lon\": \"hi\"}"))
  }

  // --- simplify properties ---
  test("simplify passes through unsupported kinds") {
    val p = Geo.point(1, 2)
    assert(Simplify.simplify(p, 0.1) eq p)
  }

  test("simplify removes low-area vertices, keeps endpoints") {
    // nearly-collinear chain: middle points have tiny triangle areas
    val wkt = "LINESTRING(0 0,1 0.0001,2 0,3 0.0001,4 0,5 5)"
    val g = Geo.parseWkt(wkt)
    val s = Simplify.simplify(g, 0.01)
    val coords = s.getCoordinates
    assert(coords.head.x == 0 && coords.head.y == 0)
    assert(coords.last.x == 5 && coords.last.y == 5)
    assert(coords.length < g.getNumPoints)
    // surviving vertices are a subset of the originals
    val orig = g.getCoordinates.map(c => (c.x, c.y)).toSet
    assert(coords.forall(c => orig((c.x, c.y))))
  }

  test("simplify keeps high-area vertices") {
    val g = Geo.parseWkt("LINESTRING(0 0,5 10,10 0)")
    val s = Simplify.simplify(g, 0.5)
    assert(s.getNumPoints == 3)
  }

  test("simplify polygon keeps validity and ring closure") {
    // noisy square ring
    val pts = (0 until 40).map { i =>
      val t = i / 40.0 * 4
      val side = t.toInt
      val frac = t - side
      val (x, y) = side match {
        case 0 => (frac * 10, 0.0)
        case 1 => (10.0, frac * 10)
        case 2 => (10 - frac * 10, 10.0)
        case _ => (0.0, 10 - frac * 10)
      }
      s"${x + 0.001 * (i % 3)} ${y + 0.001 * ((i + 1) % 3)}"
    }
    val wkt = s"POLYGON((${pts.mkString(",")},${pts.head}))"
    val g = Geo.parseWkt(wkt)
    val s = Simplify.simplify(g, 0.05)
    assert(s.isValid)
    assert(s.getNumPoints < g.getNumPoints)
    assert(math.abs(s.getArea - g.getArea) / g.getArea < 0.05)
  }

  test("simplifyToCount epsilon-doubling loop reaches target") {
    val pts = (0 to 200).map(i => s"$i ${math.sin(i * 0.1)}").mkString(",")
    val g = Geo.parseWkt(s"LINESTRING($pts)")
    val s = Simplify.simplifyToCount(g, 1e-6, 50)
    assert(s.getNumPoints <= 50)
    assert(s.getNumPoints >= 2)
  }

  test("simplifyToCount returns input when already small") {
    val g = Geo.parseWkt("LINESTRING(0 0,1 1,2 0)")
    assert(Simplify.simplifyToCount(g, 0.1, 5) eq g)
  }

  test("q49 closed-form construction: VW survivors == prediction for 500 hashes") {
    // local mirror of the q49 oracle (see Queries.q49SimplifyVw): anchors on
    // y=100x² survive always, teeth survive iff d >= 5; every elimination
    // count 0..8 must occur across the sample (non-vacuous)
    val seen = scala.collection.mutable.Set[Int]()
    (1L to 500L).foreach { id =>
      val h = (id * 2654435761L) % 4294967296L
      def d(t: Int): Long = 1L + ((h >> (3 * t)) % 8L)
      val coords = (0 to 16).map { i =>
        val y =
          if (i % 2 == 0) 100L * i * i
          else 100L * (i * i + 1) + d((i - 1) / 2)
        new org.locationtech.jts.geom.Coordinate(i.toDouble, y.toDouble)
      }.toArray
      val simp = Simplify.simplify(Geo.factory.createLineString(coords), 4.5)
      val expected = coords.zipWithIndex.collect {
        case (c, i) if i % 2 == 0 || d((i - 1) / 2) >= 5L => c
      }
      assert(simp.getCoordinates.toSeq == expected.toSeq, s"id=$id")
      seen += 17 - simp.getNumPoints
    }
    assert(seen == (0 to 8).toSet, s"elimination counts seen: $seen")
  }
  test("whereami twin: the reference decode/format/error contract (transport injected)") {
    import graft.ops.WhereAmI
    // success arm: GeoJSON geometry of Point(lon, lat), canonical form
    assert(WhereAmI.fromResponse(
      """{"status":"success","lat":34.0522,"lon":-118.2437,"city":"Los Angeles"}""") ==
      Right("""{"coordinates":[-118.2437,34.0522],"type":"Point"}"""))
    // serde as_f64 coerces integers
    assert(WhereAmI.fromResponse("""{"lat":34,"lon":-118}""") ==
      Right("""{"coordinates":[-118.0,34.0],"type":"Point"}"""))
    // ...but NOT numeric strings (stricter than json-munge heuristic 1)
    assert(WhereAmI.fromResponse("""{"lat":"34.05","lon":-118.2}""") ==
      Left("""Invalid IP location response: {"lat":"34.05","lon":-118.2}"""))
    // missing lat/lon -> invalid-response arm, canonical compact echo
    assert(WhereAmI.fromResponse("""{"status":"fail","message":"private range"}""") ==
      Left("""Invalid IP location response: {"message":"private range","status":"fail"}"""))
    // non-object JSON indexes to null in serde -> same arm
    assert(WhereAmI.fromResponse("[1,2]") ==
      Left("""Invalid IP location response: [1,2]"""))
    // unparseable body -> IPGeolocationError (the reqwest/serde error arm)
    intercept[GeoqException](WhereAmI.fromResponse("not json {"))
  }
}
