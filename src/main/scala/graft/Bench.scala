package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Results are materialized
  * through the noop sink — a bare count() would let Catalyst prune the
  * actual operator work (UDFs, projections) and time only the scan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events/documents at sf0.1 are single-digit-MB files: under the
      // 128 MB default they scan as ONE partition and the UDF-heavy parse
      // queries (q31/q32) run on one core. Same lever as bench/Scaling.
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // queries carrying observe() instrumentation (q50's banded-candidate
    // counts) report here: last value per metric name, emitted in the JSON
    // so cost drift in candidate generation is visible per run
    val observed = graft.bench.Observed.register(spark)

    // JVM/Spark warmup on an unmeasured small query
    try SparkEntry.queries("q01_agg")(spark, sfDir).write.format("noop")
      .mode("overwrite").save()
    catch { case _: Throwable => }

    // This host's multi-thread throughput drifts in minutes-long epochs
    // (BENCH/BASELINE.md): a single sample per query is unfalsifiable —
    // round 2's driver file showed 4x ghost regressions that a rerun
    // erased. Run the WHOLE suite REPS times (interleaving reps across
    // queries spreads each query's samples over epochs) and report the
    // per-query MEDIAN plus [min,max] spread. Caches (e.g. the shared
    // MinHash signature table) stay warm across reps by design: the bench
    // measures steady-state operator throughput, not first-touch cost.
    val REPS = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val names = SparkEntry.queries.toSeq.sortBy(_._1).map(_._1)
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to REPS; name <- names) {
      val fn = SparkEntry.queries(name)
      val sec =
        try time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        catch { case _: Throwable => -1.0 }
      if (sec >= 0) samples(name) = samples(name) :+ sec
    }
    def median(v: Vector[Double]): Double = {
      val s = v.sorted
      if (s.isEmpty) -1.0 else s((s.size - 1) / 2)
    }
    val results = names.map(n => n -> median(samples(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val spread = names.map { n =>
      val v = samples(n)
      if (v.isEmpty) "\"" + n + "\":[-1,-1]"
      else "\"" + n + "\":[" + v.min + "," + v.max + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    graft.bench.Observed.drain(spark) // async bus: wait, don't sleep-and-hope
    import scala.jdk.CollectionConverters._
    val obs = observed.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"observed":$obs,"reps":$REPS,"sf":"$sfDir"}"""
    println(json)
    // ALSO persist the line: harness wrappers (sbt) append their own footer
    // lines after main returns, so a last-line parse of captured stdout
    // fails — the file is the machine-readable copy of the same JSON.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("GEOQ_BENCH_OUT", "BENCH/last_bench.json"))
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, json + "\n")
    } catch {
      case scala.util.control.NonFatal(e) =>
        // warn loudly: a silent failure would leave a STALE previous-run
        // file that downstream parsing treats as this run's results
        System.err.println(s"[bench] WARNING: could not persist bench JSON: $e")
    }
    spark.stop()
  }
}
