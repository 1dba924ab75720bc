package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: ops/KMeans at smoke scale (n vectors × 64 dims,
  * k=8, 3 Lloyd steps) on the shared synthetic vector corpus — per-run
  * wall, vectors/sec, and the cluster-size spread (a degenerate
  * one-cluster collapse would make the timing meaningless). */
object KMeansProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = SmokeCorpus.vectors(spark, n).cache()
    vecs.count()
    val t0 = System.nanoTime()
    val fit = graft.ops.KMeans.fit(vecs, "vec_id", "embedding", k = 8, iters = 3)
    val sizes = fit.groupBy("cluster").agg(count(lit(1)).as("c"))
      .orderBy("cluster").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"kmeans n=$n k=8 iters=3: $sec%.1f s (${(n / sec).toLong} vec/s)")
    println("cluster sizes: " + sizes.map(_._2).mkString(" "))
    spark.stop()
  }
}
