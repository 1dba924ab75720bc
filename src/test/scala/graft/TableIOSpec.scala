package graft

import graft.sources.TableIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TableIOSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hilbert-clustered files are spatially tight (data-skipping effective)") {
    val out = Files.createTempDirectory("clustered").toString
    val pts = Queries.pts(spark, "/root/testdata/sf0.01")
    TableIO.writeClustered(pts, out, "lon", "lat", buckets = 16)

    // each written file should cover a small fraction of the world extent —
    // that's exactly what lets row-group stats prune a bbox query
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 8)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("lon"), max("lon"), min("lat"), max("lat")).head()
      val lonSpan = (r.getDouble(1) - r.getDouble(0)) / 360.0
      val latSpan = (r.getDouble(3) - r.getDouble(2)) / 180.0
      lonSpan * latSpan // fraction of world area
    }
    val meanSpan = spans.sum / spans.length
    assert(meanSpan < 0.15, s"files not spatially tight: mean area fraction $meanSpan")

    // bbox read returns exactly the rows the predicate admits
    val got = TableIO.readBbox(spark, out, -10, -10, 10, 10).count()
    val expected = pts.filter(col("lon").between(-10, 10) && col("lat").between(-10, 10)).count()
    assert(got == expected)
    assert(got > 0)

    // the predicate reaches the parquet scan (PushedFilters)
    val plan = TableIO.readBbox(spark, out, -10, -10, 10, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(lon"))
  }
}
