package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fused single-pass evaluation of [[TextFunctions.c4KeptLines]] —
  * the [[GopherStatsExpr]] recipe on the C4 line filter. The
  * composable form evaluates an interpreted lambda per LINE (a
  * `trim().rlike` + a nested per-token filter + a `lower().contains`,
  * each materializing intermediates); this walks each line once.
  *
  * BIT PARITY with the composable form (CurationSpec differences the
  * two over the corpus + edges); equivalences relied on:
  *  - `split(c, "\n")` (limit −1) keeps trailing empty lines; an empty
  *    line fails the terminal-punctuation test either way.
  *  - `trim` strips spaces only; `rlike("[.!?\"']$")` ≡ the trimmed
  *    line's last char ∈ {., !, ?, ", '} — AFTER skipping at most ONE
  *    trailing line terminator: Java `$` without MULTILINE also
  *    matches immediately before a FINAL \r, \u0085, \u2028 or \u2029
  *    (\n cannot survive the split), so "Good sentence.\r" (any CRLF
  *    document split on \n) is kept by the composable form and must
  *    be kept here too (round-17 advice fix; CurationSpec carries
  *    \r-terminated parity edges).
  *  - the ≥5 check counts non-empty `\s`-separated runs (the
  *    phantom-empty-token note on [[TextFunctions.gopherStats]]).
  *  - `lower(l).contains("javascript")` ≡ ASCII-case-insensitive
  *    substring search: the needle is pure ASCII and no Unicode
  *    lowercase mapping yields a CONTIGUOUS ASCII "javascript" from
  *    anything but ASCII letters (1→many mappings interpose non-ASCII
  *    combining marks; U+212A→k aside, and the needle has no 'k').
  *  - kept elements are the ORIGINAL (untrimmed) line substrings, in
  *    order — exactly what `filter` over `split` returns.
  */
case class C4KeptLinesExpr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${t.simpleString}")
    }

  override protected def withNewChildInternal(
      newChild: Expression): C4KeptLinesExpr = copy(child = newChild)

  @inline private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r'

  @inline private def asciiLower(ch: Char): Char =
    if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch

  private val Needle = "javascript"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val n = s.length
    val kept = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.unsafe.types.UTF8String]
    var lineStart = 0
    var m = 0
    while (m <= n) {
      if (m == n || s.charAt(m) == '\n') {
        // space-trim bounds (Spark `trim` strips ' ' only)
        var a = lineStart
        var b = m
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        // Java `$` (no MULTILINE) matches before ONE final line
        // terminator, so the punctuation test looks past it (class doc)
        if (b > a && C4KeptLinesExpr.isLineTerm(s.charAt(b - 1))) b -= 1
        var keep = false
        if (a < b) {
          val last = s.charAt(b - 1)
          if (last == '.' || last == '!' || last == '?' || last == '"' ||
            last == '\'') {
            // >=5 non-empty whitespace-separated tokens, early exit
            var tokens = 0
            var k = lineStart
            var inTok = false
            while (k < m && tokens < 5) {
              if (isWs(s.charAt(k))) inTok = false
              else if (!inTok) { inTok = true; tokens += 1 }
              k += 1
            }
            if (tokens >= 5) {
              // ASCII-case-insensitive "javascript" search over the line
              var found = false
              var p = lineStart
              val limit = m - Needle.length
              while (!found && p <= limit) {
                var q = 0
                while (q < Needle.length &&
                  asciiLower(s.charAt(p + q)) == Needle.charAt(q)) q += 1
                if (q == Needle.length) found = true else p += 1
              }
              keep = !found
            }
          }
        }
        if (keep)
          kept += org.apache.spark.unsafe.types.UTF8String
            .fromString(s.substring(lineStart, m))
        lineStart = m + 1
      }
      m += 1
    }
    new GenericArrayData(kept.toArray[Any])
  }
}

object C4KeptLinesExpr {
  /** Java-regex line terminators a lone `$` matches before — minus \n,
    * which `split(c, "\n")` consumes, and minus the 2-char \r\n (its \n
    * is likewise consumed, leaving a bare trailing \r).
    */
  @inline private[functions] def isLineTerm(ch: Char): Boolean =
    ch == '\r' || ch == '\u0085' || ch == '\u2028' || ch == '\u2029'
}
