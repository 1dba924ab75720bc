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

  test("cell-bucketed tables join co-located: zero Exchange in the plan, results exact") {
    import spark.implicits._
    // two point snapshots bucketed by the SAME (bits, buckets) cell key —
    // the repeated-join storage layout: at 100 TB, re-shuffling the point
    // table on every join is the dominant cost this avoids
    val a = spark.range(4000).map { i =>
      (i, -170.0 + (i % 337).toDouble + (i % 13) * 0.07,
        -80.0 + (i % 157).toDouble + (i % 11) * 0.05)
    }.toDF("id", "lon", "lat")
    val b = spark.range(3000).map { i =>
      (i, -170.0 + ((i * 7) % 337).toDouble + (i % 17) * 0.05,
        -80.0 + ((i * 11) % 157).toDouble + (i % 7) * 0.06)
    }.toDF("rid", "lon", "lat")
    val dirA = Files.createTempDirectory("bucketed_a").toString
    val dirB = Files.createTempDirectory("bucketed_b").toString
    TableIO.writeBucketedByCell(a, "bkt_a", dirA, "lon", "lat", bits = 6, buckets = 8)
    TableIO.writeBucketedByCell(b.withColumnRenamed("rid", "id"), "bkt_b", dirB,
      "lon", "lat", bits = 6, buckets = 8)
    try {
      // force a sort-merge join so the assertion is about BUCKETING, not a
      // broadcast that would hide the shuffle question entirely
      val ta = spark.table("bkt_a").select(col("id").as("ida"), col("cell"))
      val tb = spark.table("bkt_b").select(col("id").as("idb"), col("cell"))
      val joined = ta.join(tb.hint("merge"), Seq("cell"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle either side
      val got = joined.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // ground truth: the same cell join computed from the raw frames
      val key = TableIO.cellKeyCol("lon", "lat", 6)
      val plain = a.withColumn("cell", key).select(col("id").as("ida"), col("cell"))
        .join(b.withColumn("cell", key).select(col("rid").as("idb"), col("cell")), Seq("cell"))
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == plain && got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("IVF storage: centroid-bucketed vectors serve nprobe queries via bucket pruning") {
    // the q33 scale claim made concrete: vectors stored bucketed by their
    // coarse-centroid assignment; a query probing 4 centroids reads 4 of
    // 16 buckets (SelectedBucketsCount), not the whole table
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val dot = udf((a: Seq[Double], b: Seq[Double]) => {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    })
    val assigned = emb.join(broadcast(cents))
      .withColumn("cdot", dot(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("cdot"), (-col("cent_id")).as("nc"))).as("bucket"))
      .select(col("vec_id"), col("bucket").cast("int").as("bucket"))
    val path = java.nio.file.Files.createTempDirectory("ivf_bkt").toString
    TableIO.writeBucketedBy(assigned, "ivf_vecs", path, "bucket", 16)
    try {
      val probes = Seq(2, 5, 9, 14)
      // filter-only queries get "Bucketed: false (disabled by query
      // planner)" under auto bucketed-scan selection — force the bucketed
      // scan so the IN predicate prunes buckets (the IVF read shape)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val q = spark.table("ivf_vecs").filter(col("bucket").isin(probes.map(Integer.valueOf): _*))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 4 out of 16"), plan)
      val got = q.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      val expect = assigned.filter(col("bucket").isin(probes.map(Integer.valueOf): _*))
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect && got.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS ivf_vecs")
    }
  }
}
