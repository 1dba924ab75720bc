package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL EXTRACTION + DOMAIN NORMALIZATION — the domain-level
  * grouping/filtering step of a web-corpus pipeline (per-domain quotas,
  * blocklists, source mixing all key on the registrable domain, not the
  * raw host string).
  *
  * hosts: every http(s) URL's host, via group-1 of a portable pattern
  * (Java regex and DuckDB RE2 agree on character classes and group
  * capture). normalizeHost: lowercase + strip one leading "www.".
  * apex: last two dot-separated labels — the registrable-domain
  * approximation (a public-suffix list is external data; two labels is
  * the deterministic, offline-reproducible stand-in, and the seam to
  * swap a real PSL into).
  *
  * Scale design: extraction is a row-local codegen'd
  * regexp_extract_all; the per-URL explode amplifies only by the URL
  * count per doc; domainStats is then a hash-groupBy on the apex
  * (map-side partial agg, one shuffle) — the same shape as exact
  * dedup, never all-pairs.
  */
object Urls {
  val URL_HOST = "https?://([A-Za-z0-9.-]+)"

  def hosts(text: Column): Column =
    regexp_extract_all(text, lit(URL_HOST), lit(1))

  def normalizeHost(h: Column): Column =
    regexp_replace(lower(h), "^www\\.", "")

  def apex(h: Column): Column =
    regexp_extract(h, "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)

  /** Per-apex-domain URL count, distinct-doc count, and min-id keeper. */
  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(hosts(col(textCol))).as("host"))
      .select(col(idCol), apex(normalizeHost(col("host"))).as("apex"))
      .groupBy("apex")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(idCol).as("n_docs"),
        min(idCol).as("keeper"))
}
