package graft

import graft.ckpt.Checkpointed
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class CkptSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("batched write is resumable: completed batches are skipped, output complete") {
    import spark.implicits._
    val out = Files.createTempDirectory("ckpt").toString
    val df = spark.range(1000).map(i => (i, s"row$i")).toDF("id", "v")

    val first = Checkpointed.write(df, "id", out, nBatches = 4,
      lineageInputs = Seq("synthetic:range(1000)"))
    assert(first.size == 4)
    assert(first.forall(!_.skipped))
    assert(first.map(_.rows).sum == 1000)
    assert(first.forall(_.bytes > 0))

    // simulate a restart mid-job: delete batch 2's marker + data
    Files.delete(Checkpointed.markerPath(out, 2))
    val second = Checkpointed.write(df, "id", out, nBatches = 4)
    assert(second.count(_.skipped) == 3)
    assert(second.count(!_.skipped) == 1)
    assert(second.map(_.rows).sum == 1000) // skipped batches report marker metrics

    // full output readable and complete
    val readBack = spark.read.parquet((0 until 4).map(b => s"$out/batch=$b"): _*)
    assert(readBack.count() == 1000)
    assert(readBack.select("id").distinct().count() == 1000)

    // lineage markers carry predicate + inputs
    val reports = Checkpointed.report(out)
    assert(reports.size == 4)
    assert(reports.forall(_.contains("pmod(xxhash64(id),4)")))
    assert(reports.exists(_.contains("synthetic:range(1000)")))
  }

  test("marker publish is atomic (no tmp files left)") {
    import spark.implicits._
    val out = Files.createTempDirectory("ckpt2").toString
    Checkpointed.write(spark.range(10).toDF("id"), "id", out, nBatches = 2)
    val leftovers = Files.list(Paths.get(out, "_ckpt")).iterator()
    var tmps = 0
    while (leftovers.hasNext) {
      if (leftovers.next().toString.endsWith(".tmp")) tmps += 1
    }
    assert(tmps == 0)
  }
}
