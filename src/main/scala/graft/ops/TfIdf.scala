package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TOP-K characteristic terms by an INTEGER-EXACT tf-idf
  * score — the keyword-extraction / topic-fingerprint step of a text
  * curation pipeline (near-dup triage, cluster labeling, corpus drift
  * reports all consume it).
  *
  * Score = tf · SCALE div df, all BIGINT: a float idf (`ln(N/df)`) ranks
  * identically for fixed N (both are monotone decreasing in df) but its
  * last-ulp rounding differs between engines and a one-ulp flip reorders
  * ranks — the established float-exactness recipe is integer
  * cross-multiplication, so the score IS the rank key, bit-equal
  * everywhere. Ties (equal score) break on term ascending: total order,
  * hash-gateable.
  *
  * Scale shape: tf is one map-side-combinable groupBy(doc, term); df is
  * a second partial-agg groupBy(term) over the ALREADY-collapsed tf
  * table (never the raw token stream); the join back co-partitions on
  * term; the per-doc rank filter is the literal row_number-<=-k pattern
  * Spark's WindowGroupLimit bounds map-side (ScaleSmoke-measured in the
  * q72 work: thousands, not millions, of shuffled rows at 2M docs). No
  * driver-side state at any point. */
object TfIdf {

  val SCALE = 1000000L

  /** docs: (idCol, textCol). Tokens = lowercase whitespace words (the
    * engine's q14/q71 convention). Returns one row per (doc, top-k term):
    * (idCol, term, tf, df, score, rank), rank 1..k by (score DESC, term
    * ASC). Docs whose every term is empty (blank text) emit no rows. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"topTerms: k must be >= 1, got $k")
    val tok = docs.select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score", expr(s"tf * ${SCALE}L div df"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }
}
