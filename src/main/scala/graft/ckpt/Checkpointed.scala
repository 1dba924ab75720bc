package graft.ckpt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Resumable batched writes with per-batch lineage + metrics (north rule:
  * "checkpoints per-partition lineage + row/byte metrics to resume mid-job").
  *
  * A long job over a huge table is split into `nBatches` deterministic
  * buckets of the input (pmod(xxhash64(key), n)). Each batch is one Spark
  * job writing `out/batch=K/` followed by an atomic marker
  * `out/_ckpt/batch-K.json` carrying lineage (inputs, app id, predicate) and
  * metrics (rows via Dataset.observe — no extra pass — bytes from the
  * committed files). On restart, completed batches are skipped; the batch
  * write itself is idempotent (overwrite of its own directory), so a crash
  * mid-batch re-runs just that batch. This is the batch-native form of
  * "resume from checkpoint" — per-partition lineage lives in the markers,
  * not a streaming state store (the reference has no streaming semantics,
  * SURVEY §2.9).
  */
object Checkpointed {

  final case class BatchResult(batch: Int, rows: Long, bytes: Long, wallMs: Long,
                               skipped: Boolean)

  def markerPath(outDir: String, batch: Int): Path =
    Paths.get(outDir, "_ckpt", s"batch-$batch.json")

  /** Write `df` bucketed by `keyCol` into `nBatches` resumable batches.
    * Returns per-batch results (skipped = marker already present). */
  def write(df: DataFrame, keyCol: String, outDir: String, nBatches: Int,
            lineageInputs: Seq[String] = Nil): Seq[BatchResult] = {
    val spark = df.sparkSession
    ObservedRows.ensureListener(spark)
    Files.createDirectories(Paths.get(outDir, "_ckpt"))
    val bucketed = df.withColumn("_bucket", pmod(xxhash64(col(keyCol)), lit(nBatches)))
    (0 until nBatches).map { b =>
      val marker = markerPath(outDir, b)
      if (Files.exists(marker)) {
        val m = parseMarker(Files.readString(marker))
        BatchResult(b, m.getOrElse("rows", 0L), m.getOrElse("bytes", 0L), 0L, skipped = true)
      } else {
        val t0 = System.nanoTime()
        val batchDir = s"$outDir/batch=$b"
        val observed = bucketed.filter(col("_bucket") === b).drop("_bucket")
          .observe(s"ckpt_$b", count(lit(1)).as("rows"))
        observed.write.mode("overwrite").parquet(batchDir)
        val rows = lastObserved(spark, s"ckpt_$b")
        val bytes = dirBytes(Paths.get(batchDir))
        val wallMs = (System.nanoTime() - t0) / 1000000
        val json =
          s"""{"batch":$b,"rows":$rows,"bytes":$bytes,"wallMs":$wallMs,
             |"lineage":{"appId":"${spark.sparkContext.applicationId}",
             |"keyCol":"$keyCol","nBatches":$nBatches,
             |"predicate":"pmod(xxhash64($keyCol),$nBatches)=$b",
             |"inputs":[${lineageInputs.map(s => "\"" + s + "\"").mkString(",")}]}}""".stripMargin
        // atomic publish: write tmp then move — a crash before the move
        // leaves no marker and the batch re-runs
        val tmp = marker.resolveSibling(marker.getFileName.toString + ".tmp")
        Files.writeString(tmp, json)
        Files.move(tmp, marker, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        BatchResult(b, rows, bytes, wallMs, skipped = false)
      }
    }
  }

  private def lastObserved(spark: SparkSession, name: String): Long = {
    // Dataset.observe metrics surface on the QueryExecution listener; for a
    // synchronous batch write the simplest reliable channel is the
    // observation registry via the listener below.
    ObservedRows.get(name)
  }

  private def parseMarker(json: String): Map[String, Long] = {
    def grab(key: String): Option[Long] =
      s""""$key":(\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
    Seq("rows", "bytes").flatMap(k => grab(k).map(k -> _)).toMap
  }

  def dirBytes(dir: Path): Long =
    if (!Files.exists(dir)) 0L
    else Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
      .map(p => Files.size(p)).sum

  /** Summarize checkpoint state for an output dir. */
  def report(outDir: String): Seq[String] = {
    val d = Paths.get(outDir, "_ckpt")
    if (!Files.exists(d)) return Nil
    Files.list(d).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json"))
      .sortBy(_.getFileName.toString)
      .map(p => Files.readString(p))
  }
}

/** Captures Dataset.observe metrics from completed queries. Registered
  * lazily once per JVM. */
object ObservedRows {
  private val values = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  @volatile private var registered = false

  def ensureListener(spark: SparkSession): Unit = synchronized {
    if (!registered) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            if (row.schema.fieldNames.contains("rows"))
              values.put(name, row.getAs[Long]("rows"))
          }
        }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
      registered = true
    }
  }

  def get(name: String): Long = {
    // listener delivery is async; wait briefly
    var tries = 0
    while (!values.containsKey(name) && tries < 100) {
      Thread.sleep(20)
      tries += 1
    }
    values.getOrDefault(name, -1L)
  }
}
