package graft

import graft.join.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted join produces identical pairs on skewed data") {
    import spark.implicits._
    // pathological skew: 90% of points in one tiny hot spot (one cell)
    val pts = spark.range(5000).map { i =>
      if (i % 10 != 0) (i, 10.001 + (i % 97) * 1e-6, 45.001 + (i % 89) * 1e-6)
      else (i, -170.0 + (i % 340).toDouble, -80.0 + (i % 160).toDouble)
    }.toDF("id", "lon", "lat")
    val boxes = Seq(
      (1L, 9.0, 44.0, 11.0, 46.0),   // covers the hot spot
      (2L, -100.0, -50.0, -60.0, 0.0),
      (3L, 150.0, 20.0, 179.0, 60.0))
      .toDF("rid", "minx", "miny", "maxx", "maxy")

    val plain = SpatialJoin.joinPointsInBoxes(pts, boxes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = SpatialJoin.joinPointsInBoxesSalted(pts, boxes, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(plain == salted)
    assert(plain.count(_._2 == 1L) > 4000) // the hot cell really is hot
  }

  test("optimizer rule: natural range-predicate join rewrites to the cell-keyed equi-join") {
    import spark.implicits._
    graft.plans.SpatialPlanner.enable(spark)
    val pts = spark.range(4000).map { i =>
      (i, -170.0 + (i % 337).toDouble + (i % 13) * 0.07,
        -80.0 + (i % 157).toDouble + (i % 11) * 0.05)
    }.toDF("id", "lon", "lat")
    val boxes = Seq(
      (1L, 9.0, 44.0, 11.0, 46.0),
      (2L, -100.0, -50.0, -60.0, 0.0),
      (3L, 150.0, 20.0, 179.0, 60.0),
      (4L, -179.0, -89.0, 179.0, 89.0), // near-world box: explode stays bounded
      (5L, 30.0, 30.0, 30.0, 30.0))     // degenerate box
      .toDF("rid", "minx", "miny", "maxx", "maxy")

    // the NATURAL join — exactly what a user writes
    val natural = pts.join(boxes,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"))

    // 1) plan: no nested-loop join; an equi-join on the injected cell keys
    val plan = natural.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"), plan)
    assert(plan.contains("__graft_gx"), plan)

    // 2) results: identical pairs to the DataFrame-API cell join AND to the
    //    rule-free nested-loop join
    val got = natural.select("id", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val api = SpatialJoin.joinPointsInBoxes(pts, boxes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == api)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
    val naive = pts.join(boxes,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"))
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == naive)
    assert(got.nonEmpty)

    // 3) strict bounds + extra conjuncts + flipped comparison directions
    //    still match the pattern and keep exact semantics
    graft.plans.SpatialPlanner.enable(spark)
    val mixed = pts.join(boxes,
      col("minx") < col("lon") && col("lon") < col("maxx") &&
        col("lat") >= col("miny") && !(col("lat") > col("maxy")) === lit(true) &&
        col("rid") =!= 2L)
    // note: the !(>) form is NOT a recognized upper bound — the pattern
    // needs a plain comparison; use a recognizable one instead:
    val mixed2 = pts.join(boxes,
      col("minx") < col("lon") && col("lon") < col("maxx") &&
        col("lat") >= col("miny") && col("maxy") >= col("lat") && col("rid") =!= 2L)
    val planM = mixed2.queryExecution.executedPlan.toString
    assert(planM.contains("__graft_gx"), planM)
    val gotM = mixed2.select("id", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
    val naiveM = pts.join(boxes,
      col("minx") < col("lon") && col("lon") < col("maxx") &&
        col("lat") >= col("miny") && col("maxy") >= col("lat") && col("rid") =!= 2L)
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotM == naiveM && gotM.nonEmpty)
    val _ = mixed // documented non-match form

    // 3b) a finer grid (conf-tunable) must not change results
    graft.plans.SpatialPlanner.enable(spark)
    spark.conf.set(graft.plans.SpatialJoinRewrite.BITS_KEY, "8")
    try {
      val fine = pts.join(boxes,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fine == got)
    } finally spark.conf.unset(graft.plans.SpatialJoinRewrite.BITS_KEY)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)

    // 3c) mirrored form: boxes on the LEFT (how q26's own oracle SQL is
    // written) — rewritten for Inner, identical results
    graft.plans.SpatialPlanner.enable(spark)
    val flipped = boxes.join(pts,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"))
    assert(flipped.queryExecution.executedPlan.toString.contains("__graft_gx"))
    val gotF = flipped.select("id", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotF == got)
    // mirrored LEFT-SEMI must NOT rewrite (left explode would duplicate)
    val semiFlip = boxes.join(pts,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"), "left_semi")
    assert(!semiFlip.queryExecution.executedPlan.toString.contains("__graft_gx"))
    val semiFlipRids = semiFlip.select("rid").collect().map(_.getLong(0)).sorted.toSeq
    assert(semiFlipRids == semiFlipRids.distinct)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)

    // 4) left-semi keeps each left row at most once
    graft.plans.SpatialPlanner.enable(spark)
    val semi = pts.join(boxes,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"), "left_semi")
    val semiIds = semi.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(semiIds == semiIds.distinct)
    assert(semiIds == got.map(_._1).distinct.sorted)

    // 5) LEFT ANTI (the reference's `--negate` filters at scale): rewritten
    //    — no nested loop — and exactly the complement of the semi ids.
    //    Drop the near-world box (it matches every point → vacuous anti).
    val someBoxes = boxes.filter(col("rid") =!= 4L)
    val anti = pts.join(someBoxes,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"), "left_anti")
    val planA = anti.queryExecution.executedPlan.toString
    assert(!planA.contains("NestedLoopJoin"), planA)
    assert(planA.contains("__graft_gx"), planA)
    val antiIds = anti.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(antiIds == antiIds.distinct)
    val semiSome = pts.join(someBoxes,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"), "left_semi")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val allIds = pts.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert((antiIds ++ semiSome).sorted == allIds)
    assert(antiIds.nonEmpty && semiSome.nonEmpty)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
    // rule-free anti join agrees (same keep/drop decisions as
    // GeoOps.filterIntersects --negate semantics on axis-aligned queries)
    val naiveA = pts.join(someBoxes,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"), "left_anti")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(antiIds == naiveA)
    // mirrored LEFT-ANTI must NOT rewrite (left explode would duplicate)
    graft.plans.SpatialPlanner.enable(spark)
    val antiFlip = boxes.join(pts,
      col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"), "left_anti")
    assert(!antiFlip.queryExecution.executedPlan.toString.contains("__graft_gx"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
  }

  test("dwithinJoin == brute force, including polar and antimeridian queries") {
    import spark.implicits._
    val scattered = (0 until 3000).map { i =>
      (i.toLong, -180.0 + ((i * 7) % 3571) * 0.1007, -90.0 + ((i * 11) % 1777) * 0.1013)
    }
    // dense deterministic clusters straddling ±180 at the two meridian
    // queries' latitudes, so across-the-meridian matches must exist
    val clustered = (0 until 200).map { j =>
      val lon = if (j % 2 == 0) 179.05 + (j % 18) * 0.05 else -179.95 + (j % 18) * 0.05
      val lat = if (j < 100) 8.0 + (j / 20) * 0.8 else -37.0 + ((j - 100) / 20) * 0.8
      (3000L + j, lon, lat)
    }
    val pts = (scattered ++ clustered).toDF("id", "lon", "lat")
    // queries the ORACLE deliberately avoids: near a pole, hugging ±180,
    // plus two ordinary ones
    val qs = Seq(
      (1L, 10.0, 45.0), (2L, -60.0, -20.0),
      (3L, 178.9, 10.0),   // antimeridian: cap wraps past +180
      (4L, -179.2, -35.0), // antimeridian, other side
      (5L, 30.0, 88.5),    // polar cap: crosses the pole, all longitudes
      (6L, 0.0, -89.0))    // south polar
      .toDF("qid", "qlon", "qlat")
    val R = 600000.0
    val got = SpatialJoin.dwithinJoin(pts, qs, R)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val hit = udf((lon: Double, lat: Double, qlon: Double, qlat: Double) =>
      graft.geom.Vincenty.distanceFixed(lon, lat, qlon, qlat) < R)
    val brute = pts.crossJoin(qs)
      .filter(hit(col("lon"), col("lat"), col("qlon"), col("qlat")))
      .select("id", "qid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == brute)
    // the hard cases really matched rows (the test isn't vacuous)
    Seq(3L, 4L, 5L, 6L).foreach { q =>
      assert(brute.exists(_._2 == q), s"query $q matched nothing — weak fixture")
    }
    // wrap evidence: query 3's matches include points west of -179
    val wrapIds = brute.filter(_._2 == 3L).map(_._1).toSet
    val wests = pts.filter(col("lon") < -179.0).select("id").collect().map(_.getLong(0)).toSet
    assert(wrapIds.intersect(wests).nonEmpty, "no across-the-meridian match for query 3")
  }

  test("knnGeodesic == brute force through every path (round-1, escalation, fallback)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // sparse global scatter + one dense cluster at query 1: with a small
    // initial radius, query 1 resolves in round 1, some resolve after
    // escalation, and the sparsest only in the brute-force fallback
    val scattered = (0 until 400).map { i =>
      (i.toLong, -180.0 + ((i * 131) % 3571) * 0.1007, -90.0 + ((i * 173) % 1777) * 0.1013)
    }
    val cluster = (0 until 6).map(j => (400L + j, 10.0 + j * 0.1, 45.0 + j * 0.05))
    val pts = (scattered ++ cluster).toDF("id", "lon", "lat")
    val qs = Seq(
      (1L, 10.0, 45.0), (2L, -60.0, -20.0), (3L, 178.9, 10.0),
      (4L, -179.2, -35.0), (5L, 30.0, 88.5), (6L, 0.0, -89.0))
      .toDF("qid", "qlon", "qlat")
    val got = SpatialJoin.knnGeodesic(pts, qs, k = 4, initMeters = 150000.0, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val vin = udf((lon: Double, lat: Double, qlon: Double, qlat: Double) =>
      graft.geom.Vincenty.distanceFixed(lon, lat, qlon, qlat))
    val w = Window.partitionBy("qid").orderBy(col("m").asc, col("id").asc)
    val brute = pts.crossJoin(qs)
      .withColumn("m", vin(col("lon"), col("lat"), col("qlon"), col("qlat")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .select("qid", "rank", "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == brute)
    assert(got.size == 6 * 4)
    // path coverage sanity (queries counted at each radius of the schedule):
    // query 1 has >= k within the OPENING radius (round-1 path), and at
    // least one query lacks k within the FINAL radius (fallback path)
    def withinCount(radius: Double): Map[Long, Long] = pts.crossJoin(qs)
      .withColumn("m", vin(col("lon"), col("lat"), col("qlon"), col("qlat")))
      .filter(col("m") < radius).groupBy("qid").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(withinCount(150000.0).getOrElse(1L, 0L) >= 4, "round-1 path not exercised")
    val atFinal = withinCount(150000.0 * 4)
    assert(qs.collect().exists(r => atFinal.getOrElse(r.getLong(0), 0L) < 4),
      "all queries resolved before the fallback — weaken initMeters to test it")
  }

  test("radius-adaptive grid: small-radius candidates shrink by orders of magnitude vs fixed bits=6") {
    import spark.implicits._
    // clustered regime (the q48 shape): 4000 points in a 2°x2° box, 20
    // queries drawn from them, 5 km geofence
    val pts = spark.range(4000).map { i =>
      (i, 2.0 * (((i * 2246822519L) % 4294967296L) / 4294967296.0),
        2.0 * (((i * 2654435761L) % 4294967296L) / 4294967296.0))
    }.toDF("id", "lon", "lat")
    val qs = pts.filter(col("id") % 200 === 0)
      .select(col("id").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
    val R = 5000.0
    // the auto grid really is much finer than the old fixed default
    val autoBits = SpatialJoin.bitsForRadius(R)
    assert(autoBits >= 10, s"expected a fine grid at 5 km, got bits=$autoBits")
    assert(SpatialJoin.bitsForRadius(750000.0) <= 6) // coarse at 750 km
    assert(SpatialJoin.bitsForRadius(0.001) == 12)   // clamp hi (polar full-lon explode stays bounded at 2^12)
    assert(SpatialJoin.bitsForRadius(4.0e7) == 1)    // clamp lo
    // candidate rows actually priced by the join: >=50x fewer on the fine
    // grid (fixed 620 km cells put the whole cluster in 1-2 cells)
    val candAuto = SpatialJoin.dwithinCellJoin(pts, qs, R, autoBits).count()
    val candFixed = SpatialJoin.dwithinCellJoin(pts, qs, R, 6).count()
    assert(candAuto * 50 <= candFixed,
      s"auto-grid candidates $candAuto not << fixed-grid $candFixed")
    // and the join through AUTO_BITS is still exact vs brute force
    val got = SpatialJoin.dwithinJoin(pts, qs, R)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val hit = udf((lon: Double, lat: Double, qlon: Double, qlat: Double) =>
      graft.geom.Vincenty.distanceFixed(lon, lat, qlon, qlat) < R)
    val brute = pts.crossJoin(qs)
      .filter(hit(col("lon"), col("lat"), col("qlon"), col("qlat")))
      .select("id", "qid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == brute)
    assert(got.size > qs.count(), "no non-self matches — weak fixture")
  }

  test("box-extent-adaptive grid: tiny boxes get a fine grid, results unchanged") {
    import spark.implicits._
    // clustered points + sub-0.05-degree boxes: the fixed 620 km grid put
    // the whole cluster in 1-2 cells
    val pts = spark.range(3000).map { i =>
      (i, 2.0 * (((i * 2246822519L) % 4294967296L) / 4294967296.0),
        2.0 * (((i * 2654435761L) % 4294967296L) / 4294967296.0))
    }.toDF("id", "lon", "lat")
    val boxes = spark.range(40).map { i =>
      val x = 2.0 * (((i * 48271L) % 1024L) / 1024.0)
      val y = 2.0 * (((i * 16807L) % 1024L) / 1024.0)
      (i, x, y, x + 0.04, y + 0.03)
    }.toDF("rid", "minx", "miny", "maxx", "maxy")
    val autoBits = SpatialJoin.bitsForBoxes(boxes)
    assert(autoBits == 12, s"expected the fine-grid clamp for 0.04-deg boxes, got $autoBits")
    // ONE world-spanning outlier among the tiny boxes must pull the grid
    // back to the bounded-explode regime (<= 64 cells/axis for the outlier)
    val withOutlier = boxes.unionByName(
      Seq((999L, -180.0, -90.0, 180.0, 90.0)).toDF("rid", "minx", "miny", "maxx", "maxy"))
    assert(SpatialJoin.bitsForBoxes(withOutlier) <= 6,
      s"outlier box must cap the grid, got ${SpatialJoin.bitsForBoxes(withOutlier)}")
    // nation-box-scale extents keep a coarse grid (no bench regression)
    val wide = spark.range(25).map(i =>
      (i, -100.0 + i * 2.0, -40.0 + i, -100.0 + i * 2.0 + 15.0, -40.0 + i + 10.0))
      .toDF("rid", "minx", "miny", "maxx", "maxy")
    assert(SpatialJoin.bitsForBoxes(wide) <= 6)
    // identical pairs through AUTO and through the old fixed grid
    val auto = SpatialJoin.joinPointsInBoxes(pts, boxes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val fixed = SpatialJoin.joinPointsInBoxes(pts, boxes, bits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(auto == fixed && auto.nonEmpty)
    // and boxBoxes with mixed sizes stays exact under AUTO
    val bb = SpatialJoin.joinBoxesBoxes(
      boxes.withColumnRenamed("rid", "id"), wide)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bbFixed = SpatialJoin.joinBoxesBoxes(
      boxes.withColumnRenamed("rid", "id"), wide, bits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(bb == bbFixed)
  }

  test("adaptive rewrite grid: sub-degree boxes through the NATURAL join get a fine grid (>= bitsForBoxes), results exact") {
    import spark.implicits._
    // the q48/q56 regime: clustered points, 0.05-0.2 degree boxes — the
    // old fixed bits=6 rewrite put the whole cluster into 1-2 620 km cells
    val pts = spark.range(3000).map { i =>
      (i, 2.0 * (((i * 2246822519L) % 4294967296L) / 4294967296.0),
        2.0 * (((i * 2654435761L) % 4294967296L) / 4294967296.0))
    }.toDF("id", "lon", "lat")
    val boxes = spark.range(30).map { i =>
      val x = 2.0 * (((i * 48271L) % 1024L) / 1024.0)
      val y = 2.0 * (((i * 16807L) % 1024L) / 1024.0)
      (i, x, y, x + 0.0625 + (i % 5) * 0.03125, y + 0.046875 + (i % 3) * 0.03125)
    }.toDF("rid", "minx", "miny", "maxx", "maxy")
    graft.plans.SpatialPlanner.enable(spark)
    try {
      assert(spark.conf.getOption(graft.plans.SpatialJoinRewrite.BITS_KEY).isEmpty)
      val natural = pts.join(boxes,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
      val plan = natural.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoopJoin"), plan)
      assert(plan.contains("__graft_gx"), plan)
      // the rule derived the grid from the data and published it; the
      // SQL-surface grid is never coarser than the DataFrame API's choice
      val ruleBits = spark.conf.get(graft.join.SpatialJoin.LAST_BITS_KEY).toInt
      val apiBits = graft.join.SpatialJoin.bitsForBoxes(boxes)
      assert(ruleBits >= apiBits, s"rule bits $ruleBits < api bits $apiBits")
      assert(ruleBits > 6, s"sub-degree boxes must get a fine grid, got $ruleBits")
      val got = natural.select("id", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
      val naive = pts.join(boxes,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == naive && got.nonEmpty)
      // a pinned conf still wins over the adaptive path
      graft.plans.SpatialPlanner.enable(spark)
      spark.conf.set(graft.plans.SpatialJoinRewrite.BITS_KEY, "4")
      try {
        val pinned = pts.join(boxes,
          col("lon") >= col("minx") && col("lon") <= col("maxx") &&
            col("lat") >= col("miny") && col("lat") <= col("maxy"))
        assert(pinned.queryExecution.executedPlan.toString.contains("__graft_gx"))
        assert(spark.conf.get(graft.join.SpatialJoin.LAST_BITS_KEY).toInt == 4)
        val gotP = pinned.select("id", "rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(gotP == got)
      } finally spark.conf.unset(graft.plans.SpatialJoinRewrite.BITS_KEY)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
  }

  test("adaptive rewrite guards: oversized box side keeps the fixed grid; malformed conf fails loudly") {
    import spark.implicits._
    val pts = spark.range(500).map(i =>
      (i, (i % 337).toDouble - 170.0, (i % 157).toDouble - 80.0)).toDF("id", "lon", "lat")
    val boxes = Seq((1L, 9.0, 44.0, 11.0, 46.0), (2L, -100.0, -50.0, -60.0, 0.0))
      .toDF("rid", "minx", "miny", "maxx", "maxy")
    graft.plans.SpatialPlanner.enable(spark)
    try {
      // size guard: with the stats budget forced to 1 byte every box side
      // is "too big" — the rewrite still fires but on the fixed default
      // grid, bounding planning cost for arbitrary SQL
      spark.conf.set(graft.plans.SpatialJoinRewrite.STATS_MAX_BYTES_KEY, "1")
      val guarded = pts.join(boxes,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
      assert(guarded.queryExecution.executedPlan.toString.contains("__graft_gx"))
      assert(spark.conf.get(graft.join.SpatialJoin.LAST_BITS_KEY).toInt == 6)
      val got = guarded.select("id", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      spark.conf.unset(graft.plans.SpatialJoinRewrite.STATS_MAX_BYTES_KEY)
      val unguarded = pts.join(boxes,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == unguarded && got.nonEmpty)
      // malformed conf must fail the query loudly (a silent fallback would
      // pin every join to the fixed grid — the opposite of the tuning)
      spark.conf.set(graft.plans.SpatialJoinRewrite.STATS_MAX_BYTES_KEY, "1g")
      val bad = intercept[Exception] {
        pts.join(boxes,
          col("lon") >= col("minx") && col("lon") <= col("maxx") &&
            col("lat") >= col("miny") && col("lat") <= col("maxy"))
          .queryExecution.executedPlan
      }
      assert(bad.getMessage != null &&
        bad.getMessage.contains("statsMaxBytes"), bad.getMessage)
    } finally {
      spark.conf.unset(graft.plans.SpatialJoinRewrite.STATS_MAX_BYTES_KEY)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
    }
  }

  test("API bits observability: auto-chosen grid is published to the session conf") {
    import spark.implicits._
    val pts = Seq((1L, 10.02, 45.01), (2L, -60.0, -20.0)).toDF("id", "lon", "lat")
    val boxes = spark.range(20).map { i =>
      val x = 10.0 + (i % 10) * 0.01
      (i, x, 45.0 + (i % 7) * 0.01, x + 0.05, 45.0 + (i % 7) * 0.01 + 0.04)
    }.toDF("rid", "minx", "miny", "maxx", "maxy")
    SpatialJoin.joinPointsInBoxes(pts, boxes)
    assert(spark.conf.get(SpatialJoin.LAST_BITS_KEY).toInt ==
      SpatialJoin.bitsForBoxes(boxes))
    SpatialJoin.dwithinCellJoin(pts,
      Seq((1L, 10.0, 45.0)).toDF("qid", "qlon", "qlat"), 5000.0, SpatialJoin.AUTO_BITS)
    assert(spark.conf.get(SpatialJoin.LAST_BITS_KEY).toInt ==
      SpatialJoin.bitsForRadius(5000.0))
  }

  test("q54 video near-dup: banded frame-hash LSH returns exactly the planted twins; no cartesian plan") {
    val got = Queries.q54VideoNearDup(spark, "/root/testdata/sf0.001")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("NestedLoopJoin"), plan)
    val rows = got.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val expected = (0L until Queries.VID_N by 5).map { i =>
      (f"vid$i%09d", f"vid${i + graft.img.Videos.TWIN_OFFSET}%09d",
        graft.img.Videos.frameCount(i).toLong - 1)
    }.toSeq
    assert(rows == expected)
    assert(rows.size == 100)
  }

  test("q50 embed near-dup: banded LSH == brute-force cosine; no cartesian product in the plan") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Queries.q50EmbedNearDup(spark, dir)
    // plan: candidates come from an equi-join on (band, bkey), never a
    // cartesian/nested-loop pass over all vector pairs
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("NestedLoopJoin"), plan)
    val gotPairs = got.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // brute force in-Spark (same vector set, same cosine kernel)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val all = emb.unionByName(emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + Queries.EMB_OFFSET).as("vec_id"),
        transform(col("v"), x => x * lit(2.0)).as("v")))
    val rows = all.as[(Long, Seq[Double])].collect()
    def dot(a: Seq[Double], b: Seq[Double]) = a.lazyZip(b).map(_ * _).sum
    val brute = (for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      cos = (dot(va, vb) / math.sqrt(dot(va, va))) / math.sqrt(dot(vb, vb))
      if cos >= 0.999
    } yield (ia, ib)).sorted.toSeq
    assert(gotPairs == brute)
    // exactly the planted scaled-copy pairs (and proves recall = 100%)
    val planted = rows.map(_._1).filter(id => id < Queries.EMB_OFFSET && id % 7 == 0)
      .map(id => (id, id + Queries.EMB_OFFSET)).sorted.toSeq
    assert(gotPairs == planted)
    assert(gotPairs.size == 72)
  }

  test("q43 rewrites in a CHILD session without leaking the rule to the parent") {
    val before = spark.experimental.extraOptimizations
    val df = Queries.q43NaturalJoin(spark, "/root/testdata/sf0.001")
    // the child-session plan really went through the rewrite...
    assert(df.queryExecution.executedPlan.toString.contains("__graft_gx"))
    assert(df.collect().nonEmpty)
    // ...and the parent session's optimizer config is untouched
    assert(spark.experimental.extraOptimizations == before)
    assert(!spark.experimental.extraOptimizations.contains(graft.plans.SpatialJoinRewrite))
  }

  test("q51 natural anti rewrites too and complements the semi ids") {
    val anti = Queries.q51NaturalAnti(spark, "/root/testdata/sf0.001")
    val planA = anti.queryExecution.executedPlan.toString
    assert(planA.contains("__graft_gx"), planA)
    assert(!planA.contains("NestedLoopJoin"), planA)
    val antiIds = anti.collect().map(_.getLong(0)).toSet
    // complement of the q26 inner-join's matched point set over all points
    val all = Queries.pts(spark, "/root/testdata/sf0.001")
      .select("id").collect().map(_.getLong(0)).toSet
    val matched = graft.join.SpatialJoin.joinPointsInBoxes(
        Queries.pts(spark, "/root/testdata/sf0.001"),
        Queries.nationBoxes(spark, "/root/testdata/sf0.001"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(antiIds == all.diff(matched))
    assert(antiIds.nonEmpty && matched.nonEmpty)
  }

  test("SQL surface: h3_cell function + BETWEEN joins hit the same machinery") {
    import spark.implicits._
    graft.plans.SpatialPlanner.registerSql(spark)
    // published anchor through pure SQL
    val sfCell = spark.sql("SELECT h3_cell(37.3615593d, -122.0553238d, 5) AS c")
      .collect().head.getLong(0)
    assert(java.lang.Long.toHexString(sfCell) == "85283473fffffff")
    // table-valued usage == kernel
    val rows = spark.range(500).select(
      col("id"),
      (lit(-80.0) + col("id") * 0.31).as("lat"),
      (lit(-170.0) + col("id") * 0.67).as("lon"))
    rows.createOrReplaceTempView("h3pts")
    val viaSql = spark.sql("SELECT id, h3_cell(lat, lon, 7) AS c FROM h3pts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.collect().foreach { r =>
      assert(viaSql(r.getLong(0)) ==
        graft.index.H3Geo.latLngToCell(r.getDouble(1), r.getDouble(2), 7))
    }
    // BETWEEN desugars to >=/<= before the optimizer, so the natural SQL
    // spatial join matches the rewrite pattern too
    graft.plans.SpatialPlanner.enable(spark)
    val pts = spark.range(2000).map { i =>
      (i, -170.0 + (i % 337).toDouble, -80.0 + (i % 157).toDouble)
    }.toDF("id", "lon", "lat")
    pts.createOrReplaceTempView("sql_pts")
    Seq((1L, 9.0, 44.0, 11.0, 46.0), (2L, -100.0, -50.0, -60.0, 0.0))
      .toDF("rid", "minx", "miny", "maxx", "maxy").createOrReplaceTempView("sql_boxes")
    val sqlJoin = spark.sql(
      """SELECT id, rid FROM sql_pts JOIN sql_boxes
        |ON lon BETWEEN minx AND maxx AND lat BETWEEN miny AND maxy""".stripMargin)
    assert(sqlJoin.queryExecution.executedPlan.toString.contains("__graft_gx"))
    val got = sqlJoin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
    val naive = spark.sql(
      """SELECT id, rid FROM sql_pts JOIN sql_boxes
        |ON lon BETWEEN minx AND maxx AND lat BETWEEN miny AND maxy""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == naive && got.nonEmpty)
  }

  test("codegen key expressions == imperative kernels (H3CellExpr, GeoCols.ghCol)") {
    import spark.implicits._
    val df = spark.range(4000).map { i =>
      (i, -180.0 + (i % 3571) * 0.1007, -90.0 + (i % 1777) * 0.1013)
    }.toDF("id", "lon", "lat")
    // H3CellExpr (native Catalyst, codegen'd) vs H3Geo.latLngToCell (kernel)
    for (res <- Seq(0, 3, 7)) {
      val got = df.select(col("id"), graft.functions.H3CellExpr.h3Cell(col("lat"), col("lon"), res).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      df.select("id", "lat", "lon").collect().foreach { r =>
        val expect = graft.index.H3Geo.latLngToCell(r.getDouble(1), r.getDouble(2), res)
        assert(got(r.getLong(0)) == expect, s"H3CellExpr mismatch id=${r.getLong(0)} res=$res")
      }
    }
    // GeoCols.ghCol (built-ins only) vs Geohash.fromIndices (kernel)
    for (len <- Seq(1, 3, 5, 8)) {
      val lonCells = 1L << graft.index.Geohash.lonBitsFor(len)
      val latCells = 1L << graft.index.Geohash.latBitsFor(len)
      val idx = spark.range(2000).select(col("id"),
        (col("id") * 2654435761L % lonCells).as("li"),
        (col("id") * 2246822519L % latCells).as("la"))
      val got = idx.select(col("id"), graft.functions.GeoCols.ghCol(col("li"), col("la"), len).as("gh"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      idx.collect().foreach { r =>
        val expect = graft.index.Geohash.fromIndices(r.getLong(1), r.getLong(2), len)
        assert(got(r.getLong(0)) == expect, s"ghCol mismatch id=${r.getLong(0)} len=$len")
      }
    }
    // the H3 expression really is codegen'd: no BatchEvalPython/UDF marker
    // and the projection stays inside a WholeStageCodegen span
    val plan = df.select(graft.functions.H3CellExpr.h3Cell(col("lat"), col("lon"), 5))
      .queryExecution.executedPlan.toString
    // the '*(n)' prefix marks operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l => l.contains("h3_cell") && l.trim.startsWith("*(")), plan)
  }

  test("H3-keyed PIP join produces identical pairs to the geohash-keyed join") {
    import spark.implicits._
    val pts = spark.range(3000).map { i =>
      (i, -170.0 + (i % 337).toDouble + (i % 13) * 0.07,
        -80.0 + (i % 157).toDouble + (i % 11) * 0.05)
    }.toDF("id", "lon", "lat")
    val boxes = Seq(
      (1L, 9.0, 44.0, 11.0, 46.0),
      (2L, -100.0, -50.0, -60.0, 0.0),
      (3L, 150.0, 20.0, 179.0, 60.0),
      (4L, -10.5, -5.25, 30.75, 40.5)) // edge-straddling fractions
      .toDF("rid", "minx", "miny", "maxx", "maxy")
    val gh = SpatialJoin.joinPointsInBoxes(pts, boxes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val h3 = SpatialJoin.joinPointsInBoxesH3(pts, boxes, res = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(h3 == gh)
    assert(gh.nonEmpty)
  }

  test("filterIntersectsAtScale matches broadcast filter semantics") {
    import spark.implicits._
    val lines = Seq("34.2277,-118.2623", "12,34", "9q5",
      "LINESTRING (30 10, 10 30, 40 40)",
      """{"type":"Point","coordinates":[125.6, 10.1]}""")
    val feats = graft.ops.GeoOps.parseStrings(spark, lines)
    val left = feats.toDF().select(col("rowId").as("id"), col("wkb"))
    val queries = graft.core.Entity.parseLine("9q5").map(_.geom)
    val right = Seq((0L, graft.geom.Geo.toWkb(queries.head))).toDF("id", "wkb")

    val atScale = SpatialJoin.filterIntersectsAtScale(left, right, level = 3)
      .select("id").as[Long].collect().sorted.toSeq
    val broadcastPath = graft.ops.GeoOps.filterIntersects(feats, queries)
      .map(_.rowId).collect().sorted.toSeq
    assert(atScale == broadcastPath)
    assert(atScale.nonEmpty)
  }

  test("planar knn == brute force through every path (round-1, escalation, world round)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // sparse global scatter + one dense cluster at query 1: with a small
    // initial degree radius, query 1 resolves in round 1, some resolve
    // after escalation, and the sparsest only in the world round
    val scattered = (0 until 400).map { i =>
      (i.toLong, -180.0 + ((i * 131) % 3571) * 0.1007, -90.0 + ((i * 173) % 1777) * 0.1013)
    }
    val cluster = (0 until 6).map(j => (400L + j, 10.0 + j * 0.1, 45.0 + j * 0.05))
    val pts = (scattered ++ cluster).toDF("id", "lon", "lat")
    val qs = Seq(
      (1L, 10.0, 45.0), (2L, -60.0, -20.0), (3L, 178.9, 10.0),
      (4L, -179.2, -35.0), (5L, 30.0, 88.5), (6L, 0.0, -89.0))
      .toDF("query_id", "qlon", "qlat")
    val got = SpatialJoin.knn(pts, qs, k = 4, initDeg = 0.5, rounds = 2)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val w = Window.partitionBy("query_id").orderBy(col("d2").asc, col("id").asc)
    val bruteDf = pts.crossJoin(qs)
      .filter(col("id") =!= col("query_id"))
      .withColumn("d2",
        (col("qlat") - col("lat")) * (col("qlat") - col("lat")) +
          (col("qlon") - col("lon")) * (col("qlon") - col("lon"))).cache()
    val brute = bruteDf
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .select("query_id", "rank", "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == brute)
    assert(got.size == 6 * 4)
    // path coverage sanity: query 1 has >= k within the OPENING radius
    // (round-1 path) and at least one query lacks k within the FINAL
    // scheduled radius (world-round path)
    def withinCount(deg: Double): Map[Long, Long] = bruteDf
      .filter(col("d2") < deg * deg).groupBy("query_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(withinCount(0.5).getOrElse(1L, 0L) >= 4, "round-1 path not exercised")
    val atFinal = withinCount(0.5 * 4)
    assert((1L to 6L).exists(q => atFinal.getOrElse(q, 0L) < 4),
      "all queries resolved before the world round — weaken initDeg to test it")
    bruteDf.unpersist()
  }

  test("planar knn: no CartesianProduct/BroadcastNestedLoopJoin in ANY plan the operator runs") {
    import spark.implicits._
    // the rounds execute eagerly inside knn(), so the final plan alone
    // can't witness them — capture EVERY executed plan via a listener
    // (this is the assertion that retired the old phase-2
    // broadcast(escQs).crossJoin(points) full-scan fallback)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit =
        try plans.add(qe.executedPlan.toString)
        catch { case scala.util.control.NonFatal(_) => () }
    }
    val pts = (0 until 300).map { i =>
      (i.toLong, -180.0 + ((i * 131) % 3571) * 0.1007, -90.0 + ((i * 173) % 1777) * 0.1013)
    }.toDF("id", "lon", "lat")
    // sparse queries force escalation AND the world round — the paths that
    // used to cross-join
    val qs = Seq((1L, 10.0, 45.0), (2L, 30.0, 88.5), (3L, 0.0, -89.0))
      .toDF("query_id", "qlon", "qlat")
    spark.listenerManager.register(listener)
    try {
      val res = SpatialJoin.knn(pts, qs, k = 5, initDeg = 0.25, rounds = 2).collect()
      assert(res.length == 3 * 5)
      org.apache.spark.sql.graft.bridge.waitListenerBus(spark)
      import scala.jdk.CollectionConverters._
      val all = plans.asScala.toSeq
      assert(all.nonEmpty, "listener captured no plans — assertion is vacuous")
      all.foreach { p =>
        assert(!p.contains("CartesianProduct"), p)
        assert(!p.contains("BroadcastNestedLoopJoin"), p)
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("planar knn: pinned per-round grids agree with AUTO (exact at every schedule)") {
    import spark.implicits._
    val pts = spark.range(2000).map { i =>
      (i, -170.0 + (i % 337).toDouble + (i % 13) * 0.07,
        -80.0 + (i % 157).toDouble + (i % 11) * 0.05)
    }.toDF("id", "lon", "lat")
    val qs = pts.filter(col("id") % 97 === 0)
      .select(col("id").as("query_id"), col("lon").as("qlon"), col("lat").as("qlat"))
    def run(bits: Int): Seq[(Long, Int, Long)] =
      SpatialJoin.knn(pts, qs, k = 3, bits = bits)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val auto = run(SpatialJoin.AUTO_BITS)
    assert(auto == run(4) && auto == run(9))
    assert(auto.size == qs.count() * 3)
    // the per-round auto grid tracks the radius
    assert(SpatialJoin.bitsForDegrees(4.0) == 5)
    assert(SpatialJoin.bitsForDegrees(0.05) == 11)
    assert(SpatialJoin.bitsForDegrees(1e-9) == 12)  // clamp hi
    assert(SpatialJoin.bitsForDegrees(1000.0) == 1) // world round → 2×2 cells
  }

  test("rewrite guards: pinned bits never evaluate statsMaxBytes; nested natural joins survive the stats reentry") {
    import spark.implicits._
    val pts = spark.range(500).map(i =>
      (i, (i % 337).toDouble - 170.0, (i % 157).toDouble - 80.0)).toDF("id", "lon", "lat")
    val boxes = Seq((1L, 9.0, 44.0, 11.0, 46.0), (2L, -100.0, -50.0, -60.0, 0.0))
      .toDF("rid", "minx", "miny", "maxx", "maxy")
    graft.plans.SpatialPlanner.enable(spark)
    try {
      // a session that pins bits never runs the stats job, so a malformed
      // statsMaxBytes must NOT fail its queries (the conf is validated
      // only on the adaptive path)
      spark.conf.set(graft.plans.SpatialJoinRewrite.STATS_MAX_BYTES_KEY, "1g")
      spark.conf.set(graft.plans.SpatialJoinRewrite.BITS_KEY, "5")
      val pinned = pts.join(boxes,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
      assert(pinned.queryExecution.executedPlan.toString.contains("__graft_gx"))
      assert(spark.conf.get(graft.join.SpatialJoin.LAST_BITS_KEY).toInt == 5)
      val gotPinned = pinned.select("id", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      spark.conf.unset(graft.plans.SpatialJoinRewrite.STATS_MAX_BYTES_KEY)
      spark.conf.unset(graft.plans.SpatialJoinRewrite.BITS_KEY)

      // box side CONTAINING another rewritable natural spatial join: the
      // adaptive stats sub-query re-enters the optimizer; the thread-local
      // guard pins the inner rewrite to the fixed default instead of
      // launching nested stats jobs — results must still be exact
      val nestPts = spark.range(500).map(i =>
        (i, 8.0 + (i % 40) * 0.1, 43.0 + (i % 35) * 0.1)).toDF("id", "lon", "lat")
      val innerPts = spark.range(40).map(i =>
        (1000L + i, 9.0 + (i % 20) * 0.1, 44.0 + (i % 10) * 0.2)).toDF("bid", "blon", "blat")
      val boxSide = innerPts.join(boxes,
        col("blon") >= col("minx") && col("blon") <= col("maxx") &&
          col("blat") >= col("miny") && col("blat") <= col("maxy"))
      val nested = nestPts.join(boxSide,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
      val planN = nested.queryExecution.executedPlan.toString
      assert(planN.contains("__graft_gx"), planN)
      assert(!planN.contains("NestedLoopJoin"), planN)
      val gotNested = nested.select("id", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
      val naiveNested = nestPts.join(boxSide,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
        .select("id", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(gotNested == naiveNested && gotNested.nonEmpty)
      val naivePinned = pts.join(boxes,
        col("lon") >= col("minx") && col("lon") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(gotPinned == naivePinned && gotPinned.nonEmpty)
    } finally {
      spark.conf.unset(graft.plans.SpatialJoinRewrite.STATS_MAX_BYTES_KEY)
      spark.conf.unset(graft.plans.SpatialJoinRewrite.BITS_KEY)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
    }
  }

  test("BitsMemo deployment surface: counters, size, and invalidate-then-recompute after an in-place rewrite") {
    import spark.implicits._
    import graft.join.SpatialJoin.BitsMemo
    val dir = java.nio.file.Files.createTempDirectory("bitsmemo").toString
    spark.range(50).map { i =>
      val x = (i % 30).toDouble; val y = (i % 15).toDouble
      (i, x, y, x + 0.05, y + 0.04)
    }.toDF("rid", "minx", "miny", "maxx", "maxy")
      .write.mode("overwrite").parquet(s"$dir/boxes")
    BitsMemo.clear()
    val h0 = BitsMemo.hitCount; val m0 = BitsMemo.missCount
    val fine = SpatialJoin.bitsForBoxes(spark.read.parquet(s"$dir/boxes"))
    assert(fine == 12, s"0.05-degree boxes must choose the fine clamp, got $fine")
    assert(BitsMemo.missCount == m0 + 1 && BitsMemo.size >= 1)
    // a FRESH read of the same path hits the memo (bench reps, pipelines)
    assert(SpatialJoin.bitsForBoxes(spark.read.parquet(s"$dir/boxes")) == fine)
    assert(BitsMemo.hitCount == h0 + 1)
    // counters are published to the session conf (lastBits pattern)
    assert(spark.conf.get(BitsMemo.HITS_KEY).toLong == BitsMemo.hitCount)
    assert(spark.conf.get(BitsMemo.MISSES_KEY).toLong == BitsMemo.missCount)
    // in-place rewrite: same path, wildly different extents — the memo
    // key is identical by design, so STALE bits are served (cost-only)...
    spark.range(8).map { i =>
      (i, -170.0 + i * 2.0, -80.0 + i * 1.5, 160.0, 75.0)
    }.toDF("rid", "minx", "miny", "maxx", "maxy")
      .write.mode("overwrite").parquet(s"$dir/boxes")
    assert(SpatialJoin.bitsForBoxes(spark.read.parquet(s"$dir/boxes")) == fine,
      "expected the documented stale-bits-after-rewrite behavior")
    // ...until the deployment hook invalidates and the next join re-derives
    BitsMemo.clear()
    assert(BitsMemo.size == 0)
    val coarse = SpatialJoin.bitsForBoxes(spark.read.parquet(s"$dir/boxes"))
    assert(coarse < fine, s"post-clear recompute still served $coarse")
  }

  test("density-adaptive kNN opening radius: auto == pinned results on both metrics") {
    import spark.implicits._
    val pts = spark.range(3000).map { i =>
      (i, -170.0 + (i % 337).toDouble + (i % 13) * 0.07,
        -80.0 + (i % 157).toDouble + (i % 11) * 0.05)
    }.toDF("id", "lon", "lat")
    val qsG = pts.filter(col("id") % 211 === 0)
      .select(col("id").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
    val qsP = qsG.withColumnRenamed("qid", "query_id")
    // exact at every schedule: the density-derived opener must return the
    // identical rows as explicit pins (the schedule only moves cost)
    def runG(init: Double) = SpatialJoin.knnGeodesic(pts, qsG, k = 4, initMeters = init)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(runG(SpatialJoin.AUTO_RADIUS) == runG(250000.0))
    def runP(init: Double) = SpatialJoin.knn(pts, qsP, k = 4, initDeg = init)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val autoP = runP(SpatialJoin.AUTO_RADIUS)
    assert(autoP == runP(2.0))
    assert(autoP.size == qsP.count() * 4)
  }

  test("rule-path BitsMemo hits across RE-BUILT queries (positional expression keys)") {
    import spark.implicits._
    // expression-level canonicalization keeps exprIds (fresh per analysis);
    // the rule's memo key binds the bound-expressions to ordinals in the
    // box side's output, so the same SQL re-built from scratch must HIT
    // the memo instead of re-running the stats job every bench rep
    val dir = java.nio.file.Files.createTempDirectory("rulememo").toString
    spark.range(2000).map(i => (i, (i % 337).toDouble - 170.0, (i % 157).toDouble - 80.0))
      .toDF("id", "lon", "lat").write.mode("overwrite").parquet(s"$dir/pts")
    spark.range(30).map { i =>
      val x = (i % 30).toDouble; val y = (i % 15).toDouble
      (i, x, y, x + 0.5, y + 0.4)
    }.toDF("rid", "minx", "miny", "maxx", "maxy")
      .write.mode("overwrite").parquet(s"$dir/boxes")
    graft.plans.SpatialPlanner.enable(spark)
    try {
      def build() = spark.read.parquet(s"$dir/pts")
        .join(spark.read.parquet(s"$dir/boxes"),
          col("lon") >= col("minx") && col("lon") <= col("maxx") &&
            col("lat") >= col("miny") && col("lat") <= col("maxy"))
      graft.join.SpatialJoin.BitsMemo.clear()
      val m0 = graft.join.SpatialJoin.BitsMemo.missCount
      val h0 = graft.join.SpatialJoin.BitsMemo.hitCount
      assert(build().queryExecution.executedPlan.toString.contains("__graft_gx"))
      val m1 = graft.join.SpatialJoin.BitsMemo.missCount
      assert(m1 == m0 + 1, "first build must run the stats job exactly once")
      assert(build().queryExecution.executedPlan.toString.contains("__graft_gx"))
      assert(graft.join.SpatialJoin.BitsMemo.missCount == m1,
        "re-built identical query re-ran the stats job — memo key not stable")
      assert(graft.join.SpatialJoin.BitsMemo.hitCount > h0)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(r => r == graft.plans.SpatialJoinRewrite || r == graft.plans.IntervalJoinRewrite)
  }
}
