package graft.bench

import graft.join.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Order-of-magnitude scale smoke for the core join operators: 10M
  * synthetic points (multiplicative-hash uniform globe — no testdata
  * dependency) against 10k boxes / 1k geofences / 200 kNN queries on
  * local[32]. This is NOT the correctness gate (the sf oracles are) and
  * NOT the north-rule scaling evidence (bench/Scaling is); it answers the
  * "would the plan shapes survive 100× the test scale?" question with a
  * measured run instead of an argument: every join below finishes in
  * seconds at 10M rows because candidates are cell-keyed — a nested-loop
  * or radius-unaware plan would be 10^10-pair territory.
  *
  * Usage: GEOQ_MAIN=graft.bench.ScaleSmoke bin/geoq-spark [nPoints]
  * Prints one JSON line with per-op seconds and rows/sec.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pts = spark.range(n).repartition(spark.sparkContext.defaultParallelism)
      .select(col("id"),
        (lit(-90.0) + lit(180.0) *
          (((col("id") * lit(2654435761L)) % lit(4294967296L)) / lit(4294967296.0))).as("lat"),
        (lit(-180.0) + lit(360.0) *
          (((col("id") * lit(2246822519L)) % lit(4294967296L)) / lit(4294967296.0))).as("lon"))
      .cache()
    pts.count() // materialize outside the timers

    // max(1, …) keeps tiny debug runs (n < 1000) from a modulo-by-zero
    // under ANSI mode; they just use every point as a query
    val queries = pts.filter(col("id") % lit(math.max(1L, n / 1000)) === 0)
      .select(col("id").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
    val knnQs = pts.filter(col("id") % lit(math.max(1L, n / 200)) === 0)
      .select(col("id").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
    val boxes = spark.range(10000)
      .select(col("id").as("rid"),
        (lit(-180.0) + lit(359.0) *
          (((col("id") * lit(2654435761L)) % lit(4294967296L)) / lit(4294967296.0))).as("minx"),
        (lit(-90.0) + lit(179.0) *
          (((col("id") * lit(2246822519L)) % lit(4294967296L)) / lit(4294967296.0))).as("miny"))
      .withColumn("maxx", col("minx") + lit(0.5))
      .withColumn("maxy", col("miny") + lit(0.5))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // the auto-chosen grid per op, published by the join builders — the
    // observability hook a 100 TB operator reads before pinning bits
    def lastBits: Int =
      spark.conf.getOption(SpatialJoin.LAST_BITS_KEY).map(_.toInt).getOrElse(-1)

    val (tBox, nBox) = time(SpatialJoin.joinPointsInBoxes(pts, boxes).count())
    val bBox = lastBits
    val (tDw, nDw) = time(SpatialJoin.dwithinJoin(pts, queries, 50000.0).count())
    val bDw = lastBits
    val (tKnn, nKnn) = time(SpatialJoin.knnGeodesic(pts, knnQs, k = 5).count())
    val bKnn = lastBits

    def rps(t: Double): Long = (n / math.max(t, 1e-9)).toLong
    println(
      s"""{"metric":"scale_smoke","n_points":$n,"ops":{""" +
        s""""box_join":{"sec":$tBox,"pairs":$nBox,"points_per_sec":${rps(tBox)},"auto_bits":$bBox},""" +
        s""""dwithin_50km_1k_queries":{"sec":$tDw,"pairs":$nDw,"points_per_sec":${rps(tDw)},"auto_bits":$bDw},""" +
        s""""knn_geodesic_k5_200_queries":{"sec":$tKnn,"rows":$nKnn,"points_per_sec":${rps(tKnn)},"auto_bits":$bKnn}}}""")
    spark.stop()
  }
}
