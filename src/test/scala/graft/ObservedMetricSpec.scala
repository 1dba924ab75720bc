package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The observe()-metric plumbing the bench mains and ScaleSmoke rely on:
  * a decontamination run must surface its candidate-row metric even when
  * ZERO docs end up contaminated (the round-7 sweep read -1 for exactly
  * those runs), and repeated runs with distinct metric names must not
  * clobber each other. */
class ObservedMetricSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decontam candidate metric reports when contamination is zero") {
    val sp = spark
    import sp.implicits._
    val observed = graft.bench.Observed.register(sp)
    val corpus = (0 until 200).map(i => (i.toLong, s"alpha bravo c$i delta e$i foxtrot"))
      .toDF("id", "text")
    // eval shares NO 3-gram with the corpus -> 0 contaminated docs, but
    // bloom FPs may still produce candidate rows; the metric must appear
    val eval = Seq((9999L, "zulu yankee xray whiskey victor")).toDF("id", "text")
    val n = graft.ops.Decontaminate.contaminatedDocs(
      corpus, eval, "id", "text", n = 3, metricName = "spec_cand_zero").count()
    assert(n === 0L)
    graft.bench.Observed.drain(sp)
    val v = observed.getOrDefault("spec_cand_zero", -1L)
    assert(v >= 0L, s"candidate metric missing for a zero-contamination run (got $v)")
  }

  test("two runs with distinct names both report") {
    val sp = spark
    import sp.implicits._
    val observed = graft.bench.Observed.register(sp)
    val corpus = (0 until 100).map(i => (i.toLong, s"one two three four$i five"))
      .toDF("id", "text")
    val eval = Seq((1L, "one two three")).toDF("id", "text")
    graft.ops.Decontaminate.contaminatedDocs(
      corpus, eval, "id", "text", n = 3, metricName = "spec_cand_a").count()
    graft.ops.Decontaminate.contaminatedDocs(
      corpus, eval, "id", "text", n = 2, metricName = "spec_cand_b").count()
    graft.bench.Observed.drain(sp)
    assert(observed.getOrDefault("spec_cand_a", -1L) >= 0L)
    assert(observed.getOrDefault("spec_cand_b", -1L) >= 0L)
  }
}
