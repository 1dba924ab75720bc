package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: how much of each benched query's wall is
  * CONSTRUCTION + CATALYST PLANNING (analysis, optimization, physical
  * planning — all inside Bench's timed region, every rep) vs execution?
  * Times fn(spark, sf) + forcing queryExecution.executedPlan, twice per
  * rep (second = warm-caches planning), then the full noop run. NOTE:
  * queries that run internal actions during construction (kNN rounds,
  * quantile thresholds, CC) include those actions in the "plan" time —
  * interpret those rows as construction cost, not planning. */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
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
    Observed.register(spark)
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // warm once (fills codegen + file-listing caches)
      try fn(spark, sf).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => println(s"$n FAILED"); }
      val p1 = sec { fn(spark, sf).queryExecution.executedPlan }
      val p2 = sec { fn(spark, sf).queryExecution.executedPlan }
      val full = sec { fn(spark, sf).write.format("noop").mode("overwrite").save() }
      println(f"$n%-28s plan1 $p1%6.3f  plan2 $p2%6.3f  full $full%6.3f  planShare ${100 * p2 / math.max(full, 1e-9)}%5.1f%%")
    }
    spark.stop()
  }
}
