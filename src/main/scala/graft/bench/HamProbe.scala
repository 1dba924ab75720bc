package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: band-key collision mass for the ScaleSmoke
  * synthetic corpus fingerprints (sum c·(c−1)/2 per 16-bit band key =
  * exact banded-candidate count without running the join). */
object HamProbe {
  def main(args: Array[String]): Unit = {
    val docN = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsBig = SmokeCorpus.docs(spark, docN)
    val sh64 = udf((text: String) => graft.Queries.simhash64(text))
    val sims = docsBig.select(col("id"), sh64(col("text")).as("sim")).localCheckpoint(true)
    (0 until 4).foreach { b =>
      val keys = sims.select((shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
      val r = keys.agg(sum(col("c") * (col("c") - 1) / 2).as("pairs"),
        count(lit(1)).as("distinctKeys"), max("c").as("maxC")).head()
      println(s"band $b: pairs=${r.get(0)} distinctKeys=${r.getLong(1)} maxKeyCount=${r.getLong(2)}")
    }
    spark.stop()
  }
}
