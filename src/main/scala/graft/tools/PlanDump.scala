package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics: print the formatted physical plan of a named SparkEntry
  * query, or run ad-hoc probes. Usage:
  *   GEOQ_MAIN=graft.tools.PlanDump bin/geoq-spark <queryName> <sfDir>
  *   GEOQ_MAIN=graft.tools.PlanDump bin/geoq-spark knn-probe <sfDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GEOQ_MASTER", "local[8]"))
      .appName("plan-dump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      args.toList match {
        case "knn-probe" :: dir :: Nil =>
          // force a coarse grid so the escalation (phase-2) path must fire:
          // with 4 bits (16×16 cells) candidate boxes are huge → exact; with
          // 10 bits cells are tiny → phase-1 often incomplete → escalation.
          val p = graft.Queries.pts(spark, dir)
          val qs = p.filter(col("id") % 101 === 0)
            .select(col("id").as("query_id"), col("lon").as("qlon"), col("lat").as("qlat"))
          for (bits <- Seq(4, 6, 10)) {
            val r = graft.join.SpatialJoin.knn(p, qs, k = 5, bits = bits)
              .select("query_id", "rank", "neighbor_id")
              .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
            println(s"bits=$bits rows=${r.length} sample=${r.take(3).mkString(",")}")
            println(s"bits=$bits checksum=${r.map { case (a, b, c) => a * 31 + b * 7 + c }.sum}")
          }
        case "cluster-probe" :: dir :: Nil =>
          // write the derived points hilbert-clustered, then run a bbox scan
          // and report rows + the physical plan's pushed filters
          val out = java.nio.file.Files.createTempDirectory("clustered").toString
          graft.sources.TableIO.writeClustered(
            graft.Queries.pts(spark, dir), out, "lon", "lat", buckets = 16)
          val q = graft.sources.TableIO.readBbox(spark, out, -10, -10, 10, 10)
          println(s"bbox rows: ${q.count()}")
          val scan = q.queryExecution.executedPlan.toString
          println(scan.split('\n').filter(_.contains("PushedFilters")).mkString("\n"))
          val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
          println(s"files written: $files")
        case name :: dir :: Nil =>
          SparkEntry.queriesByName(name)(spark, dir).explain("formatted")
        case other =>
          System.err.println(s"usage: PlanDump <queryName|knn-probe> <sfDir> (got $other)")
          sys.exit(2)
      }
    } finally spark.stop()
  }
}

object SparkEntry {
  def queriesByName(name: String) = graft.SparkEntry.queries(name)
}
