package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for corpus cleaning — the standard
  * pre-training scrub pass (emails, phone numbers, IPv4 addresses).
  *
  * Pure `Column` expressions over codegen'd regex functions: a narrow
  * map per document, no shuffle, so the pass scales linearly and
  * composes with quality filtering in one stage.
  *
  * The patterns deliberately use only the regex subset with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
  * classes, bounded repetition, no backreferences or lookaround — so
  * detection counts and redacted output are engine-portable.
  */
object Pii {

  /** RFC-5322-ish practical email matcher (full addresses with a TLD). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone in the 2-3-3-4 dashed wire format (TPC-H `c_phone` shape). */
  val phonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4 (unanchored; octet range not validated — redaction
    * favors recall over precision). */
  val ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(phonePattern), lit(0)))

  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(ipv4Pattern), lit(0)))

  /** Replace every email/phone/IP with typed placeholder tags. Email
    * runs first so its host part cannot be half-eaten by the IP rule. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")
}
