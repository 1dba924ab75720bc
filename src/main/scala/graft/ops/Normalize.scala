package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TEXT NORMALIZATION for dedup keys — the CCNet/RefinedWeb
  * normalize-before-dedup step: near-identical documents that differ
  * only in case, punctuation, digits, or whitespace must collapse to
  * ONE key before exact dedup, or the dedup pass misses them.
  *
  * Key = lowercase → replace every char outside [a-z ] (digits,
  * punctuation, symbols) with a space (a space, not deletion, so
  * punctuation that JOINS words — "foo,bar" — splits them instead of
  * fusing "foobar") → collapse space runs → trim. The chain is
  * idempotent: normKey(normKey(x)) == normKey(x).
  *
  * Scale design: the key is pure row-local codegen'd built-ins
  * (lower/regexp_replace/trim — no UDF, no shuffle); `dedup` is then
  * the same hash-groupBy shape as exact dedup (map-side partial agg,
  * one shuffle of (key, id) pairs, never all-pairs). Patterns use only
  * portable character classes so Java regex and the DuckDB oracle's
  * RE2 ('g' flag — DuckDB replaces only the first match without it)
  * normalize identically; the q74 gate md5-hashes the key, so one
  * divergent byte anywhere in the chain hash-fails.
  */
object Normalize {
  def normKey(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z ]", " "),
      " +", " "))

  /** Adds the normalized-key md5 (the dedup key) to each row. */
  def withKey(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("key_md5", md5(normKey(col(textCol))))

  /** Normalized exact dedup: one row per normalized key with the
    * duplicate count and the min-id keeper (the q17 contract, after
    * normalization). */
  def dedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withKey(df, textCol)
      .groupBy("key_md5")
      .agg(count(lit(1)).as("n_dups"), min(idCol).as("keeper"))
}
