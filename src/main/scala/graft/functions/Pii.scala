package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: replace emails, phone numbers, and
  * IPv4 addresses with placeholder tokens, and count what was redacted
  * (the audit trail a compliance pipeline keeps per document).
  *
  * Pure codegen'd regexp expressions — per-row work only, no shuffle, runs
  * inside whole-stage codegen at any corpus scale. Patterns stick to the
  * RE2-compatible subset (no backreferences / lookaround) so the identical
  * pattern text runs in other engines' regex dialects too.
  */
object Pii {

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\d{3}-\\d{3}-\\d{4}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Emails, then phones, then IPv4s replaced by placeholder tokens. The
    * order is load-bearing only in that emails are removed before the
    * digit-based patterns scan the remainder. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")

  /** Per-type match counts on the ORIGINAL text (the redaction audit). */
  def emailCount(c: Column): Column = regexp_count(c, lit(emailPattern))
  def phoneCount(c: Column): Column = regexp_count(c, lit(phonePattern))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(ipv4Pattern))
}
