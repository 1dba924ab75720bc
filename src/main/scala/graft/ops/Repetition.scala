package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REPETITION quality stats — the Gopher-style pretraining filters that
  * catch boilerplate/template documents: most-frequent-token and
  * most-frequent-bigram multiplicities plus distinct counts, all
  * integers so the gate compares exactly.
  *
  * Scale design: every stat is ROW-LOCAL (no explode → groupBy shuffle
  * per token — on 100 TB that shuffle would dwarf the scan). The mode
  * multiplicity is computed per row in O(L log L) as a sort + one
  * run-length pass via the `aggregate` higher-order function with a
  * struct accumulator — all codegen'd built-ins, one narrow pass over
  * the corpus. The driver-gate oracle (q70) computes the same numbers
  * DEFINITIONALLY (unnest → group → max count), so an off-by-one in
  * the run-length fold hash-fails.
  */
object Repetition {

  /** Max element multiplicity of an array column: sort, then fold a
    * (prev, run, best) struct across the sorted run. Empty array → 0. */
  def maxMultiplicity(arr: Column): Column = {
    val acc0 = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    aggregate(
      array_sort(arr),
      acc0,
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
  }

  /** Per-doc repetition stats over space-tokenized text. Output columns
    * (all integer / boolean, exact on both engines):
    * n_tokens, n_distinct_tokens, top_token_count, n_bigrams,
    * n_distinct_bigrams, top_bigram_count, repetition_ok. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val bigrams = Decontaminate.wordNgrams(col(textCol), 2)
    // null text is EXCLUDED (not emitted as a null-stats row): the q70
    // oracle's inner join drops such docs, and "stats of no text" has no
    // meaningful integer answer either way
    docs.filter(col(textCol).isNotNull).select(
      col(idCol),
      size(w).cast("long").as("n_tokens"),
      size(array_distinct(w)).cast("long").as("n_distinct_tokens"),
      maxMultiplicity(w).as("top_token_count"),
      size(bigrams).cast("long").as("n_bigrams"),
      size(array_distinct(bigrams)).cast("long").as("n_distinct_bigrams"),
      maxMultiplicity(bigrams).as("top_bigram_count"))
      .withColumn("repetition_ok",
        col("top_token_count") * lit(4L) <= col("n_tokens") &&
          col("top_bigram_count") * lit(10L) <= col("n_bigrams"))
  }
}
