package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the write side of q36's PII *extraction*: replace
  * every email / IPv4 / phone match with a typed placeholder token, the
  * edit a training pipeline actually ships (extraction only reports).
  * Reuses [[graft.enrich.EntityExtract.Ipv4Pattern]] (reference
  * re.go:6-9 semantics) for the IP rule so detection and redaction can
  * never disagree on what an IP is.
  *
  * Scale shape: a pure per-row map over codegen'd `regexp_replace` —
  * no shuffle, no UDF, scales embarrassingly. Rule ORDER is part of the
  * contract: emails first (their local parts contain digits a later
  * numeric rule could shred), then IPs, then bare phone numbers; each
  * placeholder contains no digits or `@`, so later rules can't re-match
  * inside an earlier rule's replacement.
  */
object PiiRedact {

  val EmailRule: (String, String) =
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val Ipv4Rule: (String, String) =
    (graft.enrich.EntityExtract.Ipv4Pattern.pattern(), "<IP>")
  /** Digit-boundary lookarounds so a 7-digit phone shape never matches
    * INSIDE a longer digit run — "2024-0815" (a date) and "12345-6789"
    * (zip+4) must survive redaction intact, not be shredded into
    * "2<PHONE>"-style fragments. */
  val PhoneRule: (String, String) =
    ("(?<![0-9])[0-9]{3}-[0-9]{4}(?![0-9])", "<PHONE>")

  val DefaultRules: Seq[(String, String)] = Seq(EmailRule, Ipv4Rule, PhoneRule)

  /** Apply `rules` in order (left fold of `regexp_replace`). */
  def redact(c: Column, rules: Seq[(String, String)] = DefaultRules): Column =
    rules.foldLeft(c) { case (acc, (re, tok)) =>
      regexp_replace(acc, re, tok)
    }

  /** Count of matches `redact` would replace, summed across rules —
    * counted on the SAME progressively-redacted text the fold rewrites,
    * so overlapping rules never double-count one span. */
  def redactionCount(
      c: Column, rules: Seq[(String, String)] = DefaultRules): Column = {
    val (total, _) = rules.foldLeft((lit(0L), c)) {
      case ((n, cur), (re, tok)) =>
        (n + size(regexp_extract_all(cur, lit(re), lit(0))).cast("long"),
          regexp_replace(cur, re, tok))
    }
    total
  }
}
