package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: decompose q37_h3_compact — cell-expr derivation,
  * kernel UDF, struct projection, global sort. */
object Q37Probe {
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
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val comp = udf((cell: Long, res: Int) => {
      import graft.index.{H3, H3Cover}
      val kids = H3.cellToChildren(cell, res + 2)
      val compacted = H3Cover.compact(kids.toSet)
      (kids.size, compacted.size,
        if (compacted == Set(cell)) java.lang.Long.toHexString(cell) else "MISMATCH")
    })
    def cells = spark.read.parquet(s"$sf/events.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("event_id").as("id"),
        expr(graft.OracleSql.H3_CELL_EXPR).as("cell"),
        expr(graft.OracleSql.H3_RES_EXPR).cast("int").as("res"))
    for (r <- 1 to 3) {
      println(s"--- rep $r ---")
      t("cells only") { cells.write.format("noop").mode("overwrite").save() }
      t("cells+TRIVIAL udf") {
        val triv = udf((cell: Long, res: Int) => (1, 1, java.lang.Long.toHexString(cell)))
        cells.withColumn("c", triv(col("cell"), col("res")))
          .select(col("id"), col("c._1"), col("c._2"), col("c._3"))
          .write.format("noop").mode("overwrite").save()
      }
      t("cells+udf no sort") {
        cells.withColumn("c", comp(col("cell"), col("res")))
          .select(col("id"), col("c._1"), col("c._2"), col("c._3"))
          .write.format("noop").mode("overwrite").save()
      }
      t("cells sort only") {
        cells.select("id", "cell").orderBy("id")
          .write.format("noop").mode("overwrite").save()
      }
      t("full q37") {
        graft.SparkEntry.queries("q37_h3_compact")(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
