package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: a trailing global orderBy SAMPLES its child to
  * compute range bounds, re-executing every kernel below it — measured
  * ~2× kernel cost on a synthetic 20 µs/row UDF (0.23 s plain vs 0.59 s
  * sorted; computing the kernel AFTER the sort instead is a trap — AQE
  * coalesces the small sorted exchange to one partition and serializes
  * the kernel, 1.38 s). For EXPENSIVE kernels the guide-§8 shape is to
  * materialize the derived table once (eager localCheckpoint) and let
  * the sample + sort read blocks. A/B-interleaves the declared heavy-
  * kernel queries against that variant. */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{OracleSql, Queries}

    def h3Cells: DataFrame =
      Queries.tbl(spark, sf, "events.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("event_id").as("id"),
          expr(OracleSql.H3_CELL_EXPR).as("cell"),
          expr(OracleSql.H3_RES_EXPR).cast("int").as("res"))

    // q38 body, parameterized on whether the kernel output is
    // checkpointed before the trailing orderBy
    def q38(ckpt: Boolean): DataFrame = {
      val cover = udf((cell: Long, res: Int) => {
        import graft.index.{H3Cover, H3Geo}
        val selfCover = H3Cover.polygonCells(H3Geo.cellPolygon(cell), res)
        val n = H3Geo.neighborsCached(cell).head
        val (cla, cln) = H3Geo.cellToLatLng(cell)
        val (nla, nln) = H3Geo.cellToLatLng(n)
        val line = graft.geom.Geo.factory.createLineString(Array(
          new org.locationtech.jts.geom.Coordinate(cln, cla),
          new org.locationtech.jts.geom.Coordinate(nln, nla)))
        val lineCover = H3Cover.lineCells(line, res)
        (selfCover.size, selfCover == Set(cell),
          lineCover.contains(cell), lineCover.contains(n))
      })
      val derived = h3Cells
        .withColumn("c", cover(col("cell"), col("res")))
        .select(col("id"), lower(hex(col("cell"))).as("cell_str"),
          col("c._1").as("n_self_cover"), col("c._2").as("self_exact"),
          col("c._3").as("line_has_a"), col("c._4").as("line_has_b"))
      (if (ckpt) derived.localCheckpoint(true) else derived).orderBy("id")
    }

    def time(df: DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (df, (System.nanoTime() - t0) / 1e9)
    }
    def run(n: String, f: Boolean => DataFrame, fanLabelTrue: String, fanLabelFalse: String): Unit = {
      time(f(true)); time(f(false)) // warm
      val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      for (_ <- 1 to reps; v <- Seq(true, false)) {
        val key = if (v) fanLabelTrue else fanLabelFalse
        val (df, s) = time(f(v))
        // drop the probe's checkpoint blocks so reps don't accumulate
        df.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
          case _ => ()
        }
        acc(key) = s :: acc(key)
      }
      for (k <- Seq(fanLabelTrue, fanLabelFalse)) {
        val xs = acc(k)
        println(f"$n/$k%-9s min ${xs.min}%.3f  med ${xs.sorted.apply(xs.size / 2)}%.3f  reps ${xs.map(x => f"$x%.2f").mkString(",")}")
      }
    }
    run("q38", q38, "A-ckpt", "B-plain")
    spark.stop()
  }
}
