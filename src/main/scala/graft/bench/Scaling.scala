package graft.bench

import graft.Queries
import graft.img.Images
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** North-rule scaling measurement: spatial-join + tiling throughput over the
  * image+caption table at a given parallelism level. A wrapper
  * (tools/run_scaling.sh) runs two parallelism pairs — local[2]/local[8] and
  * local[8]/local[32] — in separate JVMs and reports throughput + scaling
  * efficiency in BENCH/BASELINE.md (sandbox stand-in for N vs 4N executors,
  * driver rule; see BASELINE.md).
  *
  * Phase 0 (unmeasured, cached across runs): write the deterministic image
  * table to parquet once — the 100 TB table stand-in.
  * Measured job: scan parquet → decode image bytes → recompute phash
  * (integrity check) → anchor → level-5 tile assign + per-tile counts
  * (shuffle) → anchor × nation-box cell-keyed spatial join (broadcast) →
  * hilbert index + global order (range-partitioned sort).
  *
  * Usage: Scaling <cores> <rows> <sfDir>  → prints one JSON line.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rows = args(1).toLong
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val tableDir = s"/tmp/graft_bench_images_$rows"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // phase 0: materialize the image table once (all levels share it)
    val marker = java.nio.file.Paths.get(tableDir, "_DONE")
    if (!java.nio.file.Files.exists(marker)) {
      spark.range(rows).repartition(64).map(i => Images.generate(i))
        .write.mode("overwrite").parquet(tableDir)
      java.nio.file.Files.writeString(marker, "ok")
    }

    // unmeasured warmup (codegen + codec paths)
    spark.read.parquet(tableDir).limit(2000)
      .as[graft.img.ImageRow]
      .map(r => Images.phash(Images.decode(r.bytes)))
      .write.format("noop").mode("overwrite").save()

    val t0 = System.nanoTime()

    val anchors = spark.read.parquet(tableDir)
      .select("image_id", "bytes", "phash")
      .as[(String, Array[Byte], Long)]
      .map { case (id, bytes, storedPhash) =>
        // decode-grade per-row work: decode + recompute phash, verify vs
        // stored (the engine's integrity invariant), derive the anchor
        val ph = Images.phash(Images.decode(bytes))
        require(ph == storedPhash, s"phash mismatch for $id")
        (id, Images.anchorLon(ph), Images.anchorLat(ph), ph)
      }.toDF("id", "lon", "lat", "phash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val tileUdf = udf((lon: Double, lat: Double) => graft.index.Geohash.encode(lat, lon, 5))
    val tileCounts = anchors.withColumn("tile", tileUdf(col("lon"), col("lat")))
      .groupBy("tile").agg(count(lit(1)).as("n"))

    val joined = graft.join.SpatialJoin.joinPointsInBoxes(
      anchors, Queries.nationBoxes(spark, sfDir))
      .groupBy("rid").agg(count(lit(1)).as("n"))

    val h = udf((x: Long, y: Long) => graft.index.Hilbert.hilbertUnsigned(x.toInt, y.toInt))
    val ordered = anchors
      .withColumn("x", floor((lit(65535.0) * (col("lon") - lit(-180.0))) / lit(360.0)))
      .withColumn("y", floor((lit(65535.0) * (col("lat") - lit(-90.0))) / lit(180.0)))
      .withColumn("h", h(col("x"), col("y")))
      .orderBy("h")
      .select("id", "h")

    def t(f: => Unit): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    val tTiles = t(tileCounts.write.format("noop").mode("overwrite").save())
    val tJoin = t(joined.write.format("noop").mode("overwrite").save())
    val tOrder = t(ordered.write.format("noop").mode("overwrite").save())
    anchors.unpersist()

    val sec = (System.nanoTime() - t0) / 1e9
    val rps = rows / sec
    println(s"""{"job":"image-scan-tile-join","cores":$cores,"rows":$rows,"sec":$sec,"rows_per_sec":$rps,"stages":{"tiles":$tTiles,"join":$tJoin,"order":$tOrder}}""")
    spark.stop()
  }
}
