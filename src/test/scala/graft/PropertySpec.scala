package graft

import graft.geom.{Geo, Num}
import graft.index.{Geohash, Hilbert}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants complementing the ported goldens.
  * (scalatestplus isn't on the offline classpath — a small deterministic
  * driver over scalacheck Gen stands in for ScalaCheckPropertyChecks.)
  */
class PropertySpec extends AnyFunSuite {
  private val params = Gen.Parameters.default

  def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(20260816L)
    (0 until n).foreach { i =>
      f(g.pureApply(params, seed))
      seed = seed.next
    }
  }
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))
  def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd))(t => f(t._1, t._2, t._3, t._4))
  def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  val lat: Gen[Double] = Gen.choose(-89.9, 89.9)
  val lon: Gen[Double] = Gen.choose(-179.9, 179.9)

  test("number formatting round-trips exactly") {
    forAll(Gen.choose(-1e9, 1e9)) { (d: Double) =>
      assert(java.lang.Double.parseDouble(Num.rust(d)) == d)
      assert(java.lang.Double.parseDouble(Num.json(d)) == d)
    }
  }

  test("geohash encode/decode: point lies in its cell bbox") {
    forAll(lat, lon, Gen.choose(1, 12)) { (la: Double, lo: Double, len: Int) =>
      val gh = Geohash.encode(la, lo, len)
      val (minLon, minLat, maxLon, maxLat) = Geohash.decodeBbox(gh)
      assert(lo >= minLon && lo <= maxLon)
      assert(la >= minLat && la <= maxLat)
    }
  }

  test("geohash encode agrees with index-quantized encode") {
    forAll(lat, lon, Gen.choose(1, 8)) { (la: Double, lo: Double, len: Int) =>
      val lonCells = 1L << Geohash.lonBitsFor(len)
      val latCells = 1L << Geohash.latBitsFor(len)
      val li = math.min(math.floor((lo + 180.0) / 360.0 * lonCells).toLong, lonCells - 1)
      val ai = math.min(math.floor((la + 90.0) / 180.0 * latCells).toLong, latCells - 1)
      assert(Geohash.encode(la, lo, len) == Geohash.fromIndices(li, ai, len))
    }
  }

  test("adjacent is invertible: n then s returns the cell (away from poles)") {
    forAll(Gen.choose(-60.0, 60.0), lon, Gen.choose(2, 9)) { (la: Double, lo: Double, len: Int) =>
      val gh = Geohash.encode(la, lo, len)
      assert(Geohash.adjacent(Geohash.adjacent(gh, 'n'), 's') == gh)
      assert(Geohash.adjacent(Geohash.adjacent(gh, 'e'), 'w') == gh)
    }
  }

  test("covering cells all intersect the geometry; point's cell is its encode") {
    forAll(lat, lon) { (la: Double, lo: Double) =>
      val p = Geo.point(lo, la)
      val cells = Geohash.covering(p, 4)
      assert(cells.nonEmpty && cells.size <= 4)
      cells.foreach(c => assert(Geohash.bboxPolygon(c).intersects(p)))
      assert(cells.contains(Geohash.encode(la, lo, 4)))
    }
  }

  test("covering of a bbox polygon includes every corner's cell") {
    forAll(Gen.choose(-80.0, 70.0), Gen.choose(-170.0, 160.0)) { (la: Double, lo: Double) =>
      val poly = Geo.boxPolyBL(lo, la, lo + 5, la + 5)
      val cells = Geohash.covering(poly, 2)
      assert(cells.toSet.contains(Geohash.encode(la + 0.001, lo + 0.001, 2)))
      assert(cells.toSet.contains(Geohash.encode(la + 4.999, lo + 4.999, 2)))
    }
  }

  test("wkt write∘parse is identity on point grids") {
    forAll(lat, lon) { (la: Double, lo: Double) =>
      val p = Geo.point(lo, la)
      val wkt = Geo.toWkt(p)
      val back = Geo.parseWkt(wkt)
      assert(back.equalsExact(p))
    }
  }

  test("geojson write∘parse is identity") {
    forAll(lat, lon) { (la: Double, lo: Double) =>
      val ls = Geo.factory.createLineString(Array(
        new org.locationtech.jts.geom.Coordinate(lo, la),
        new org.locationtech.jts.geom.Coordinate(lo / 2, la / 2),
        new org.locationtech.jts.geom.Coordinate(-lo, -la)))
      val s = Geo.geometryJsonString(ls)
      val back = Geo.geometryFromJson(graft.geom.Json.parseObject(s))
      assert(back.equalsExact(ls))
    }
  }

  test("hilbert is injective on sampled grid points") {
    val seen = scala.collection.mutable.HashMap.empty[Long, (Int, Int)]
    forAll(Gen.choose(0, 65535), Gen.choose(0, 65535)) { (x: Int, y: Int) =>
      val h = Hilbert.hilbertUnsigned(x, y)
      seen.get(h).foreach { case (px, py) => assert((px, py) == (x, y)) }
      seen.put(h, (x, y))
      assert(h >= 0 && h <= 0xFFFFFFFFL)
    }
  }

  test("hilbert locality: adjacent grid cells are nearby on the curve on average") {
    val rng = new scala.util.Random(7)
    val dists = (0 until 2000).map { _ =>
      val x = rng.nextInt(65535); val y = rng.nextInt(65535)
      math.abs(Hilbert.hilbertUnsigned(x, y) - Hilbert.hilbertUnsigned(x + 1, y))
    }
    // median adjacent-step distance must be tiny relative to the 2^32 range
    val median = dists.sorted.apply(dists.size / 2)
    assert(median <= 16L, s"median curve step $median")
  }

  test("minhash signature similarity tracks shingle jaccard") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val near = "the quick brown fox jumps over the lazy cat and runs far away"
    val far = "completely different content with nothing shared at all here"
    def agree(a: String, b: String): Int =
      Queries.minhashSig(a).zip(Queries.minhashSig(b)).count { case (x, y) => x == y }
    assert(agree(base, base) == 8)
    assert(agree(base, near) > agree(base, far))
  }

  test("vincenty is symmetric and positive") {
    forAll(lat, lon, lat, lon) { (a1: Double, o1: Double, a2: Double, o2: Double) =>
      whenever(math.abs(a1 - a2) > 0.01 || math.abs(o1 - o2) > 0.01) {
        val d1 = graft.geom.Vincenty.distance(o1, a1, o2, a2)
        val d2 = graft.geom.Vincenty.distance(o2, a2, o1, a1)
        (d1, d2) match {
          case (Some(x), Some(y)) =>
            assert(x > 0)
            assert(math.abs(x - y) < 1e-6)
          case _ => // non-convergence (near-antipodal) allowed
        }
      }
    }
  }
}
