package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run an arbitrary query SEQUENCE repeatedly in one
  * JVM under the exact Bench config (args: reps q1 q2 ...), to expose
  * cross-query interactions the single-query QBench can't see. */
object MixProbe {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val names = args.drop(1).toSeq
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
    for (r <- 1 to reps) {
      val line = names.map { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        f"$n=${(System.nanoTime() - t0) / 1e9}%.2f"
      }.mkString(" ")
      println(s"rep $r: $line")
    }
    spark.stop()
  }
}
