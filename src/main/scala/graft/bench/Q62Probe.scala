package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: decompose q62_jaccard_pairs — shingle-set UDF +
  * checkpoint, prefix-index construction (freq agg + rank window),
  * candidate join + distinct, exact refine. */
object Q62Probe {
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
    import org.apache.spark.sql.expressions.Window
    val tauNum = 4; val tauDen = 5
    val shSet = udf((text: String) => graft.Queries.shingleHashes(text).distinct.sorted)
    for (r <- 1 to 3) {
      println(s"--- rep $r ---")
      var ds: org.apache.spark.sql.DataFrame = null
      t("ds ckpt (udf+sort)") {
        ds = graft.Queries.docs(spark, sf).filter(col("doc_id") % 4 === 0)
          .select(col("doc_id").as("id"), shSet(col("text")).as("shs"))
          .select(col("id"), sort_array(array_distinct(col("shs"))).as("shs"))
          .withColumn("nsh", size(col("shs")))
          .localCheckpoint(true)
      }
      val ex = ds.select(col("id"), col("nsh"), explode(col("shs")).as("sh"))
      val freq = ex.groupBy("sh").agg(count(lit(1)).as("__cnt"))
      val ceilTauN = ((col("nsh") * tauNum + tauDen - 1) / tauDen).cast("int")
      val wOrd = Window.partitionBy("id").orderBy(col("__cnt").asc, col("sh").asc)
      var prefix: org.apache.spark.sql.DataFrame = null
      t("prefix index (ckpt)") {
        prefix = ex.join(freq, Seq("sh"))
          .withColumn("__rk", row_number().over(wOrd))
          .filter(col("__rk") <= col("nsh") - ceilTauN + 1)
          .select("id", "nsh", "__rk", "sh")
          .localCheckpoint(true)
      }
      def oreq(naCol: org.apache.spark.sql.Column, nbCol: org.apache.spark.sql.Column) =
        floor(((naCol + nbCol) * tauNum + tauNum + tauDen - 1) / (tauNum + tauDen)).cast("int")
      var cand: org.apache.spark.sql.DataFrame = null
      t("cand join + distinct") {
        cand = prefix.as("a").join(prefix.as("b"),
            col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
              col("a.nsh") * tauDen >= col("b.nsh") * tauNum &&
              col("b.nsh") * tauDen >= col("a.nsh") * tauNum &&
              lit(1) + least(col("a.nsh") - col("a.__rk"), col("b.nsh") - col("b.__rk")) >=
                oreq(col("a.nsh"), col("b.nsh")))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
          .localCheckpoint(true)
      }
      t("refine joins + udf") {
        cand
          .join(ds.select(col("id").as("id_a"), col("shs").as("__A"), col("nsh").as("__na")), Seq("id_a"))
          .join(ds.select(col("id").as("id_b"), col("shs").as("__B"), col("nsh").as("__nb")), Seq("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      var q62: org.apache.spark.sql.DataFrame = null
      t("full q62 construct") {
        q62 = graft.SparkEntry.queries("q62_jaccard_pairs")(spark, sf)
      }
      t("full q62 write") {
        q62.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
