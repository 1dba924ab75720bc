package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: is the pts()/docs() round-robin fan-out worth its
  * exchange for COLUMN-NATIVE (whole-stage-codegen) consumers, where the
  * per-row work is a handful of arithmetic instructions? Interleaves the
  * current shape (A = with repartition) against the narrow shape (B =
  * scan only) for the codegen-only query bodies, N reps each in one JVM
  * under the exact Bench session config, printing per-rep seconds. */
object RepartProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Queries.{latIdxCol, lonIdxCol}

    def ptsFrom(base: DataFrame): DataFrame = base.select(
      col("event_id").as("id"),
      (lit(-90.0) + lit(180.0) *
        (((col("event_id") * lit(2654435761L)) % lit(4294967296L)) / lit(4294967296.0))).as("lat"),
      (lit(-180.0) + lit(360.0) *
        (((col("event_id") * lit(2246822519L)) % lit(4294967296L)) / lit(4294967296.0))).as("lon"))
    def events(fanOut: Boolean): DataFrame = {
      val raw = spark.read.parquet(s"$sf/events.parquet")
      ptsFrom(if (fanOut) raw.repartition(spark.sparkContext.defaultParallelism) else raw)
    }
    def ghCol2(len: Int)(lonIdx: org.apache.spark.sql.Column, latIdx: org.apache.spark.sql.Column) =
      graft.functions.GeoCols.ghCol(lonIdx.cast("long"), latIdx.cast("long"), len)

    def q02(fan: Boolean) = events(fan)
      .withColumn("gh", ghCol2(5)(lonIdxCol(5), latIdxCol(5)))
      .select("id", "gh").orderBy("id")
    def q03(fan: Boolean) = {
      val suffixes = "0123456789bcdefghjkmnpqrstuvwxyz".map(c => lit(c.toString))
      events(fan)
        .withColumn("gh", ghCol2(3)(lonIdxCol(3), latIdxCol(3)))
        .select("gh").distinct()
        .withColumn("c", explode(array(suffixes: _*)))
        .select(col("gh"), concat(col("gh"), col("c")).as("child"))
        .orderBy("gh", "child")
    }
    def q05(fan: Boolean) = events(fan)
      .withColumn("tile", ghCol2(3)(lonIdxCol(3), latIdxCol(3)))
      .groupBy("tile").agg(count(lit(1)).as("n_points"))
      .orderBy("tile")
    def docsDf(fan: Boolean) = {
      val raw = spark.read.parquet(s"$sf/documents.parquet")
      if (fan) raw.repartition(spark.sparkContext.defaultParallelism) else raw
    }
    def q17(fan: Boolean) = docsDf(fan)
      .select(col("doc_id"), md5(substring(col("text"), 1, 32)).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keeper"))
      .orderBy("k")
    def q83(fan: Boolean) = graft.ops.Sampling.hashSplit(
        docsDf(fan).select(col("doc_id"), col("source")), "doc_id",
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
      .orderBy("doc_id")

    val shapes: Seq[(String, Boolean => DataFrame)] = Seq(
      "q02" -> q02, "q03" -> q03, "q05" -> q05, "q17" -> q17, "q83" -> q83)
    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then interleave A/B within each rep
    shapes.foreach { case (_, f) => time(f(true)); time(f(false)) }
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 1 to reps; (n, f) <- shapes; fan <- Seq(true, false)) {
      val key = s"$n/${if (fan) "A-fan" else "B-narrow"}"
      acc(key) = time(f(fan)) :: acc(key)
    }
    for ((n, _) <- shapes; fan <- Seq("A-fan", "B-narrow")) {
      val xs = acc(s"$n/$fan")
      println(f"$n/$fan%-9s min ${xs.min}%.3f  med ${xs.sorted.apply(xs.size / 2)}%.3f  reps ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
