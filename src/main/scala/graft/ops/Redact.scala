package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII REDACTION — the anonymization step of a training-data pipeline:
  * mask emails, phone numbers, and IPv4 addresses with typed
  * placeholders, and count what was masked (the audit trail a redaction
  * job must emit).
  *
  * Scale design: pure row-local regexp_replace / regexp_extract_all
  * over codegen'd built-ins — one narrow pass, no shuffle, no UDF. The
  * patterns use only portable character-class constructs, so Java
  * regex (engine) and RE2 (DuckDB oracle, with the 'g' flag — DuckDB
  * replaces only the FIRST match without it, Spark always replaces
  * all) transform text identically; the q73 gate compares the redacted
  * STRING byte-for-byte, so an ordering or greediness divergence
  * anywhere in the chain hash-fails.
  *
  * Replacement order matters and is fixed: EMAIL → IP → PHONE. Emails
  * go first (their local/domain parts may contain digits and dots that
  * the IP pattern could claim); the placeholders contain no digits or
  * '@', so later patterns can never match earlier replacements.
  */
object Redact {
  val EMAIL = "[A-Za-z0-9]+@[A-Za-z0-9.]+[A-Za-z0-9]"
  val IP = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  val PHONE = "\\+[0-9][0-9-]+[0-9]"

  def redactCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL, "<EMAIL>"),
        IP, "<IP>"),
      PHONE, "<PHONE>")

  /** Per-doc redaction + audit counts (counts are over the ORIGINAL
    * text): (idCol, n_emails, n_ips, n_phones, redacted). */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EMAIL), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(IP), lit(0))).as("n_ips"),
      size(regexp_extract_all(t, lit(PHONE), lit(0))).as("n_phones"),
      redactCol(t).as("redacted"))
  }
}
