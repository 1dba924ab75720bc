package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: the ScaleSmoke exact-Hamming entries (64-bit 4×16
  * vs 128-bit 8×16 at the same n) run STANDALONE — same corpus
  * construction as ScaleSmoke, for measuring the wider join's candidate
  * price without paying for the rest of the smoke. */
object Ham128Probe {
  def main(args: Array[String]): Unit = {
    val docN = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val observed = Observed.register(spark)
    val docsBig = SmokeCorpus.docs(spark, docN).cache()
    docsBig.count()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val sh64 = udf((text: String) => graft.Queries.simhash64(text))
    val sims64 = docsBig.select(col("id"), sh64(col("text")).as("sim"))
    val (t64, n64) = time(graft.join.SimilarityJoin.simhashHammingJoin(
      sims64, k = 3, bits = 64, bands = 4, metricName = "p64").count())
    Observed.drain(spark)
    println(f"64-bit  k=3: $t64%.1f s pairs=$n64 cands=${observed.getOrDefault("p64", -1L)}")
    val sh128 = udf((text: String) => graft.Queries.simhash128(text))
    val sims128 = docsBig.select(col("id"), sh128(col("text")).as("s"))
      .select(col("id"), col("s")(0).as("lo"), col("s")(1).as("hi"))
    val (t128, n128) = time(graft.join.SimilarityJoin.simhash128HammingJoin(
      sims128, k = 7, metricName = "p128").count())
    Observed.drain(spark)
    println(f"128-bit k=7: $t128%.1f s pairs=$n128 cands=${observed.getOrDefault("p128", -1L)}")
    spark.stop()
  }
}
