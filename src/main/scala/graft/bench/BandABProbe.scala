package graft.bench

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B: the banded hamming join core with (a) no explicit
  * repartition, (b) pinned repartition on (band,bkey), (c) pinned
  * round-robin on the UNION only — for the 64-bit/4-band (q61/q63/q76)
  * and 128-bit/8-band (q86) shapes, interleaved reps in one JVM. */
object BandABProbe {
  def core(s: DataFrame, simCols: Seq[String], nBands: Int,
           bandKey: Int => Column,
           hamming: (String => Column, String => Column) => Column,
           k: Int, variant: String): DataFrame = {
    val n = s.sparkSession.sparkContext.defaultParallelism
    var banded = (0 until nBands).map { b =>
      s.select((col("id") +: lit(b).as("band") +: bandKey(b).as("bkey") +:
        simCols.map(col)): _*)
    }.reduce(_ unionByName _)
    if (variant == "pin") banded = banded.repartition(n, col("band"), col("bkey"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select((col("a.id").as("id_a") +: col("b.id").as("id_b") +:
        (simCols.map(c => col(s"a.$c").as(s"__a_$c")) ++
         simCols.map(c => col(s"b.$c").as(s"__b_$c")))): _*)
    cand
      .withColumn("hamming", hamming(c => col(s"__a_$c"), c => col(s"__b_$c")))
      .filter(col("hamming") <= k)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sh64 = udf((text: String) => graft.Queries.simhash64(text))
    val sh128 = udf((text: String) => graft.Queries.simhash128(text))
    val docs = graft.Queries.docs(spark, sf)
    val s64 = docs.select(col("doc_id").as("id"), sh64(col("text")).as("sim"))
      .localCheckpoint(true)
    val base = docs.select(col("doc_id"), col("text"))
    val twins = base.select((col("doc_id") + 100000L).as("doc_id"),
      concat(lit("  "), col("text"), lit(" ")).as("text"))
    val s128 = base.unionByName(twins)
      .select(col("doc_id").as("id"), sh128(col("text")).as("s"))
      .select(col("id"), col("s")(0).as("lo"), col("s")(1).as("hi"))
      .localCheckpoint(true)
    val mask = (1L << 16) - 1
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (rep <- 1 to 4; variant <- Seq("plain", "pin")) {
      val t64 = t {
        core(s64, Seq("sim"), 4,
          b => shiftright(col("sim"), b * 16).bitwiseAND(lit(mask)),
          (a, b) => bit_count(a("sim").bitwiseXOR(b("sim"))), 3, variant)
          .write.format("noop").mode("overwrite").save()
      }
      val t128 = t {
        core(s128, Seq("lo", "hi"), 8,
          b => shiftright(if (b < 4) col("lo") else col("hi"), (b % 4) * 16)
            .bitwiseAND(lit(mask)),
          (a, b) => bit_count(a("lo").bitwiseXOR(b("lo"))) +
            bit_count(a("hi").bitwiseXOR(b("hi"))), 7, variant)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"rep $rep $variant%-6s 64bit=$t64%.2f 128bit=$t128%.2f")
    }
    spark.stop()
  }
}
