package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: decompose q63_components' wall time into its
  * stages — fingerprint+checkpoint, banded pair join, CC rounds (with
  * per-round seconds), final join+sort — under the exact Bench session
  * config. Reps interleave so each stage sees warm JVM state. */
object Q63Probe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to reps) {
      val sh = udf((text: String) => graft.Queries.simhash32(text))
      var sims: org.apache.spark.sql.DataFrame = null
      val tSims = t {
        sims = graft.Queries.docs(spark, sf)
          .select(col("doc_id").as("id"), sh(col("text")).as("sim"))
          .localCheckpoint(true)
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      val tPairs = t {
        pairs = graft.join.SimilarityJoin.simhashHammingJoin(sims, k = 1, bands = 2,
            metricName = "probe_band_rows")
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .localCheckpoint(true)
      }
      val rounds = scala.collection.mutable.ArrayBuffer[Double]()
      var comps: org.apache.spark.sql.DataFrame = null
      val tCc = t {
        comps = graft.ops.ConnectedComponents.run(sims.select("id"), pairs, 30,
          (_, s, _) => rounds += s)
      }
      val tOut = t {
        comps.select(col("id").as("doc_id"), col("component"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      println(f"rep $r: sims=$tSims%.2f pairs=$tPairs%.2f cc=$tCc%.2f " +
        f"(rounds=${rounds.size}: ${rounds.map(x => f"$x%.2f").mkString(",")}) out=$tOut%.2f")
    }
    spark.stop()
  }
}
