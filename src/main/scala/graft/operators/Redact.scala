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

  /** 16-digit payment-card candidates. */
  val CardCandPat = "\\b\\d{16}\\b"

  /** Luhn checksum over a 16-digit string — the checksum-validation
    * layer a bare regex lacks: any invoice/tracking/order number is a
    * 16-digit run, but only ~1 in 10 passes Luhn, so validating
    * candidates cuts the false-redaction rate by ~10× (redacting
    * non-PII corrupts training text just like missing PII leaks it).
    * For length 16 the doubled digits sit at even 0-based offsets;
    * `2d − 9` folds the two-digit products. Pure integer fold —
    * bit-identical in any engine. */
  def luhnValid16(c: Column): Column =
    aggregate(sequence(lit(0), lit(15)), lit(0),
      (acc, i) => {
        val d = c.substr(i + 1, lit(1)).cast("int")
        acc + when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }) % 10 === 0

  /** Replace every Luhn-VALID 16-digit candidate with `<CC>`; invalid
    * candidates stay (they are not card numbers). Fold-of-replaces
    * over the validated candidate list — still a pure map stage. */
  def redactValidCards(text: Column): Column = {
    import graft.functions.TextFunctions.bound
    bound(filter(regexp_extract_all(text, lit(CardCandPat), lit(0)),
        luhnValid16 _)) { valids =>
      aggregate(valids, text, (acc, c) => replace(acc, c, lit("<CC>")))
    }
  }

  /** Count of Luhn-valid candidates (the number of redactions
    * [[redactValidCards]] performs, counting duplicates once each). */
  def validCardCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(CardCandPat), lit(0)),
      luhnValid16 _))
}
