package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: run the 64-bit and 128-bit banded hamming joins
  * and print the FINAL adaptive physical plan (post-AQE), to see the
  * actual join strategy and partition counts the bench pays for. */
object BandPlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = udf((text: String) => graft.Queries.simhash64(text))
    val sims = graft.Queries.docs(spark, sf)
      .select(col("doc_id").as("id"), sh(col("text")).as("sim"))
    val t0 = System.nanoTime()
    val j = graft.join.SimilarityJoin.simhashHammingJoin(sims, k = 3, bits = 64,
      bands = 4, metricName = "probe61_rows")
    j.write.format("noop").mode("overwrite").save()
    println(f"q61-shape join: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(j.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("AQEShuffleRead") || l.contains("Sort ") ||
        l.contains("HashAggregate") || l.contains("LocalTableScan") ||
        l.contains("Scan ExistingRDD"))
      .mkString("\n"))
    spark.stop()
  }
}
