package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: where do the per-row format/parse queries
  * (q12/q13/q31/q32) spend their time? Phase 1 times the raw kernels
  * single-threaded on the driver (no Spark): Geo.toWkt, geometryJsonString,
  * Entity.parseLine. Phase 2 times q12 variants under Bench config:
  * scan+orderBy only, UDF only, full query. */
object FmtProbe {
  def main(args: Array[String]): Unit = {
    val n = 100000
    // ---- phase 1: raw kernel CPU ----
    def cpu(label: String)(f: Int => Unit): Unit = {
      var i = 0
      while (i < 2000) { f(i); i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { f(i); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-24s ${dt}%.3f s total, ${dt / n * 1e6}%.2f us/row")
    }
    import graft.geom.Geo
    cpu("toWkt(point)") { i =>
      Geo.toWkt(Geo.point((i % 360 - 180).toDouble, (i % 180 - 90).toDouble))
    }
    cpu("gjString(point)") { i =>
      Geo.geometryJsonString(Geo.point((i % 360 - 180).toDouble, (i % 180 - 90).toDouble))
    }
    cpu("parseLine(wkt)") { i =>
      graft.core.Entity.parseLine(s"POINT (${i % 360 - 180} ${i % 180 - 90})")
    }
    cpu("parseLine+both") { i =>
      val e = graft.core.Entity.parseLine(s"POINT (${i % 360 - 180} ${i % 180 - 90})").head
      Geo.geometryJsonString(e.geom)
    }
    cpu("Num.rust(frac)") { i => graft.geom.Num.rust(i * 0.000001 + 0.1) }

    // ---- phase 2: q12 variants under Bench config ----
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
    val wkt = udf((lonI: Long, latI: Long) =>
      Geo.toWkt(Geo.point(lonI.toDouble, latI.toDouble)))
    for (r <- 1 to 3) {
      println(s"--- rep $r ---")
      t("scan+repart only") {
        graft.Queries.pts(spark, sf).select("id")
          .write.format("noop").mode("overwrite").save()
      }
      t("scan+orderBy") {
        graft.Queries.pts(spark, sf).select("id").orderBy("id")
          .write.format("noop").mode("overwrite").save()
      }
      t("q12 no orderBy") {
        graft.Queries.pts(spark, sf)
          .withColumn("loni", col("id") % 360 - 180)
          .withColumn("lati", col("id") % 180 - 90)
          .withColumn("wkt", wkt(col("loni"), col("lati")))
          .select("id", "wkt")
          .write.format("noop").mode("overwrite").save()
      }
      t("q12 full") {
        graft.SparkEntry.queries("q12_wkt_point")(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      t("q32 full") {
        graft.SparkEntry.queries("q32_parse_wkt")(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
