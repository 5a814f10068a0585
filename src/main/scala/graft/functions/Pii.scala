package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: the scrub every curation
  * pipeline runs before text leaves quarantine (the reference point is
  * q86's digit-run scrub on event payloads — this is its full-breadth
  * corpus twin). Each rule is (name, RE2-safe regex, replacement
  * token); rules apply IN ORDER to the running redacted text, and each
  * rule's audit count is taken at ITS stage — so digits inside an
  * already-redacted email are never double-counted by the generic
  * digit-run rule, and the per-type counts sum to the true number of
  * replacements performed.
  *
  * Rule order is most-specific-first: structured identifiers (email,
  * IBAN, card, SSN) before the loose formats (phone, IPv4) before the
  * digit-run catch-all. Everything is `regexp_replace`/`regexp_count`
  * over codegen'd builtins — one narrow projection, shuffle-free,
  * linear at any corpus size; all patterns avoid backreferences and
  * lookaround so an RE2 engine (the DuckDB oracle) replays them
  * bit-for-bit.
  */
object Pii {

  /** (rule name, pattern, replacement token), in application order. */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("iban", "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}\\b", "<IBAN>"),
    ("cc", "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b", "<CC>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    (
      "phone",
      "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{2,4}\\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}",
      "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("num", "[0-9]+", "<NUM>"))

  /** Redact `c` under the full rule chain and audit each stage:
    * `struct(n_email, n_iban, n_cc, n_ssn, n_phone, n_ip, n_num,
    * redacted)`. Counts are per-stage (taken on the text as the rule
    * sees it), so they are exactly the replacement counts.
    */
  def redactAudit(c: Column): Column = {
    val (finalText, counts) =
      Rules.foldLeft((c, Seq.empty[Column])) {
        case ((text, acc), (name, pat, token)) =>
          // ONE regex pass per rule: split on the pattern, then count =
          // segments−1 and rewrite = join-with-token — vs the
          // count+replace pair, which scanned the text twice per rule
          // (regexp_count itself lowers to regexp_extract_all, which
          // also materializes every match). Semantics are identical:
          // java.util.regex non-overlapping left-to-right matching in
          // both forms, limit −1 keeps trailing empty segments so a
          // match at end-of-text still contributes its token, and a
          // leading match yields an empty first segment. Patterns
          // cannot match empty (all require ≥1 char), so split cannot
          // produce the zero-width-match artifacts. The shared `segs`
          // subtree is deduplicated by codegen subexpression
          // elimination (count and join both reference it).
          val segs = split(text, pat, -1)
          val n = (size(segs) - 1).cast("long").as(s"n_$name")
          (array_join(segs, token), acc :+ n)
      }
    struct(counts :+ finalText.as("redacted"): _*)
  }
}
