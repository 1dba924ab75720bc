package graft.ckpt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Resumable batched writes with per-batch lineage + metrics (north rule:
  * "checkpoints per-partition lineage + row/byte metrics to resume mid-job").
  *
  * A long job over a huge table is split into `nBatches` deterministic
  * buckets of the input (pmod(xxhash64(key), n)), written as parquet
  * partitions `batch=K/`, each published by an atomic marker
  * `out/_ckpt/batch-K.json` carrying lineage (inputs, app id, predicate) and
  * metrics (rows from the committed parquet footers — metadata-only reads —
  * bytes from the committed files).
  *
  * Scale shape: ALL missing buckets are written in ONE scan of the input
  * (`partitionBy("batch")` + dynamic partition overwrite), so a fresh run
  * reads the table exactly once — N sequential filtered scans would be N×
  * read amplification at 100 TB. On restart, buckets with markers are
  * dropped from the scan's filter and never rewritten; dynamic overwrite
  * only replaces the partitions the pass actually touches.
  *
  * Crash granularity is per PASS (a crash mid-pass re-runs the whole
  * missing set): `bucketsPerPass` trades read amplification for finer
  * resume points — at 100 TB keep the default single pass and size
  * `nBatches` to the downstream consumer, lowering `bucketsPerPass` only
  * when the cost of a re-run pass exceeds an extra scan.
  */
object Checkpointed {

  final case class BatchResult(batch: Int, rows: Long, bytes: Long, wallMs: Long,
                               skipped: Boolean)

  def markerPath(outDir: String, batch: Int): Path =
    Paths.get(outDir, "_ckpt", s"batch-$batch.json")

  /** Write `df` bucketed by `keyCol` into `nBatches` resumable batches.
    * Returns per-batch results (skipped = marker already present). */
  def write(df: DataFrame, keyCol: String, outDir: String, nBatches: Int,
            lineageInputs: Seq[String] = Nil,
            bucketsPerPass: Int = Int.MaxValue): Seq[BatchResult] = {
    val spark = df.sparkSession
    Files.createDirectories(Paths.get(outDir, "_ckpt"))
    val done = (0 until nBatches).filter(b => Files.exists(markerPath(outDir, b))).toSet
    val missing = (0 until nBatches).filterNot(done)
    val bucketed = df.withColumn("batch", pmod(xxhash64(col(keyCol)), lit(nBatches)))

    val fresh = scala.collection.mutable.Map[Int, BatchResult]()
    missing.grouped(math.max(1, bucketsPerPass)).foreach { pass =>
      val t0 = System.nanoTime()
      bucketed.filter(col("batch").isin(pass.map(b => java.lang.Long.valueOf(b.toLong)): _*))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(outDir)
      val wallMs = (System.nanoTime() - t0) / 1000000
      pass.foreach { b =>
        val batchDir = Paths.get(outDir, s"batch=$b")
        val rows = footerRows(spark, batchDir)
        val bytes = dirBytes(batchDir)
        val json =
          s"""{"batch":$b,"rows":$rows,"bytes":$bytes,"wallMs":$wallMs,
             |"lineage":{"appId":"${spark.sparkContext.applicationId}",
             |"keyCol":"$keyCol","nBatches":$nBatches,
             |"passBatches":[${pass.mkString(",")}],
             |"predicate":"pmod(xxhash64($keyCol),$nBatches)=$b",
             |"inputs":[${lineageInputs.map(s => "\"" + s + "\"").mkString(",")}]}}""".stripMargin
        // atomic publish: write tmp then move — a crash before the move
        // leaves no marker and the batch re-runs
        val marker = markerPath(outDir, b)
        val tmp = marker.resolveSibling(marker.getFileName.toString + ".tmp")
        Files.writeString(tmp, json)
        Files.move(tmp, marker, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        fresh(b) = BatchResult(b, rows, bytes, wallMs, skipped = false)
      }
    }

    (0 until nBatches).map { b =>
      fresh.getOrElse(b, {
        val m = parseMarker(Files.readString(markerPath(outDir, b)))
        BatchResult(b, m.getOrElse("rows", 0L), m.getOrElse("bytes", 0L), 0L, skipped = true)
      })
    }
  }

  /** Committed row count from parquet footers — metadata-only, no data scan. */
  private def footerRows(spark: org.apache.spark.sql.SparkSession, dir: Path): Long = {
    if (!Files.exists(dir)) return 0L
    val conf = spark.sparkContext.hadoopConfiguration
    scala.util.Using.resource(Files.list(dir)) { stream =>
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
    }
  }

  private def parseMarker(json: String): Map[String, Long] = {
    def grab(key: String): Option[Long] =
      s""""$key":(\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
    Seq("rows", "bytes").flatMap(k => grab(k).map(k -> _)).toMap
  }

  def dirBytes(dir: Path): Long =
    if (!Files.exists(dir)) 0L
    else scala.util.Using.resource(Files.walk(dir)) { stream =>
      stream.iterator().asScala
        .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
        .map(p => Files.size(p)).sum
    }

  /** Summarize checkpoint state for an output dir. */
  def report(outDir: String): Seq[String] = {
    val d = Paths.get(outDir, "_ckpt")
    if (!Files.exists(d)) return Nil
    scala.util.Using.resource(Files.list(d)) { stream =>
      stream.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".json"))
        .sortBy(_.getFileName.toString)
        .map(p => Files.readString(p))
    }
  }
}
