package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: the ScaleSmoke connected-components entry (planted
  * 10k-hop chain + Zipf star clusters at ~n edges) run STANDALONE — for
  * old-vs-new comparisons of the CC kernel without paying for the rest of
  * the smoke. Mirrors ScaleSmoke.scala's construction exactly. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val chainLen = 10000L
    val ccEdges = spark.range(chainLen - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionByName(spark.range(chainLen, n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("id").as("src"),
          (lit(chainLen) + least(
            floor(lit(4294967296.0) /
              (graft.ops.Sampling.mix32(col("id")) + lit(1L))).cast("long"),
            lit(1000000L))).as("dst")))
    def storageBytes: Long = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    val ccBase = storageBytes
    var ccPeak = 0L
    val ccT0 = System.nanoTime()
    val ccLabels = graft.ops.ConnectedComponents.run(
      spark.range(n).toDF("id"), ccEdges, 30,
      (r, s, changed) => {
        ccPeak = math.max(ccPeak, storageBytes - ccBase)
        println(f"round $r: $s%.2f s changed=$changed")
      })
    val chainMax = ccLabels.filter(col("id") < chainLen)
      .agg(max("component")).head().getLong(0)
    val tCc = (System.nanoTime() - ccT0) / 1e9
    require(chainMax == 0L, s"chain failed to collapse: max=$chainMax")
    println(f"cc n=$n total=$tCc%.1f s peak_storage=${ccPeak / 1024 / 1024} MB")
    spark.stop()
  }
}
