package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — a first-class pass in any training-data pipeline:
  * emails, phone numbers, and IPv4 addresses are replaced with typed
  * placeholder tokens before text ships to training.
  *
  * Shape: pure map stage (regexp_replace chains inside whole-stage
  * codegen), no shuffle, trivially 100-TB-safe. The patterns are
  * deliberately written in the common subset of Java regex and RE2 so
  * the DuckDB oracle (t13) runs the byte-identical procedure.
  *
  * Order matters: emails first (an email's local part can contain
  * digit runs a phone pattern could claim), then phones, then IPv4.
  */
object Redact {

  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePat = "\\+\\d[\\d().-]{7,}\\d"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPat, "<EMAIL>"),
        PhonePat, "<PHONE>"),
      Ipv4Pat, "<IP>")

  /** Total matches across the three pattern classes (counted on the
    * original text, same order-independent semantics as the oracle). */
  def redactionCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPat), lit(0))) +
      size(regexp_extract_all(regexp_replace(c, EmailPat, "<EMAIL>"),
        lit(PhonePat), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(regexp_replace(c, EmailPat, "<EMAIL>"),
          PhonePat, "<PHONE>"),
        lit(Ipv4Pat), lit(0)))

  /** doc_id → (redacted text, redaction count). */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      redactText(col(textCol)).as("redacted"),
      redactionCount(col(textCol)).as("n_redactions"))
}
