package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for [[graft.ops.TfIdf]]: hand-computed scores on a tiny
  * corpus, term-ascending tie break, k-truncation, blank-doc behavior.
  * Gated end-to-end as q85 against the DuckDB oracle. */
class TfIdfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed tf/df/score, tie break on term, k truncation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry"),
      (3L, "  Apple  apple  ")).toDF("doc_id", "text")
    val out = graft.ops.TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    // df: apple 2, banana 2, cherry 2 — all terms df=2
    // doc 1: apple tf=2 score=1000000, banana tf=1 500000, cherry tf=1 500000
    //   → rank1 apple, rank2 banana (tie with cherry broken on term asc)
    // doc 2: cherry tf=2 1000000, banana tf=1 500000
    // doc 3: apple tf=2 (lowercased) 1000000
    assert(out.toSeq === Seq(
      (1L, "apple", 2L, 2L, 1000000L, 1),
      (1L, "banana", 1L, 2L, 500000L, 2),
      (2L, "cherry", 2L, 2L, 1000000L, 1),
      (2L, "banana", 1L, 2L, 500000L, 2),
      (3L, "apple", 2L, 2L, 1000000L, 1)))
  }

  test("blank documents emit no rows; k=1 keeps exactly one term per doc") {
    import spark.implicits._
    val docs = Seq((1L, "   "), (2L, "x y x")).toDF("doc_id", "text")
    val out = graft.ops.TfIdf.topTerms(docs, "doc_id", "text", k = 1).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 2L && out.head.getString(1) === "x")
    intercept[IllegalArgumentException] {
      graft.ops.TfIdf.topTerms(docs, "doc_id", "text", k = 0)
    }
  }
}
