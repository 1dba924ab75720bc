package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: decompose q86_simhash128_pairs — fingerprint
  * UDF+checkpoint cost (and whether the array-index projection doubles
  * the UDF), band-join candidate cost, refine+distinct+sort cost. */
object Q86Probe {
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
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sh = udf((text: String) => graft.Queries.simhash128(text))
    for (r <- 1 to 3) {
      println(s"--- rep $r ---")
      def base = graft.Queries.docs(spark, sf).select(col("doc_id"), col("text"))
      def twins = base.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("  "), col("text"), lit(" ")).as("text"))
      t("udf only (noop)") {
        base.unionByName(twins)
          .select(col("doc_id").as("id"), sh(col("text")).as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      t("udf + item projection") {
        base.unionByName(twins)
          .select(col("doc_id").as("id"), sh(col("text")).as("s"))
          .select(col("id"), col("s")(0).as("lo"), col("s")(1).as("hi"))
          .write.format("noop").mode("overwrite").save()
      }
      var sims: org.apache.spark.sql.DataFrame = null
      t("sims + checkpoint") {
        sims = base.unionByName(twins)
          .select(col("doc_id").as("id"), sh(col("text")).as("s"))
          .select(col("id"), col("s")(0).as("lo"), col("s")(1).as("hi"))
          .localCheckpoint(true)
      }
      t("band join from ckpt") {
        graft.join.SimilarityJoin.simhash128HammingJoin(sims, k = 7,
            metricName = "probe128_rows")
          .write.format("noop").mode("overwrite").save()
      }
      t("full q86") {
        graft.SparkEntry.queries("q86_simhash128_pairs")(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
