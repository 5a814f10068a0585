package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Fused single-pass evaluation of [[TextFunctions.gopherStats]]
  * (brief preference order (b): custom Expression over UDF — the
  * SignatureExpressions precedent).
  *
  * The composable form pays an interpreted lambda per ARRAY ELEMENT:
  * per-token `rlike("[A-Za-z]")` and per-line `trim(l).rlike(...)` are
  * a few hundred interpreted regex invocations per document, plus an
  * `aggregate` fold and an `array_intersect` materialization
  * (profiled at ~2.9 ms/doc — the whole cost of q201's rule battery).
  * This expression computes every field in two tight scans of the
  * string (token scan + line scan), no regex, no intermediate arrays.
  *
  * BIT PARITY with the composable form (asserted in CurationSpec over
  * the corpus and edge cases); the equivalences relied on:
  *  - tokens = `split(trim(c), "\\s+")` minus empties ≡ maximal runs
  *    of non-`\s` chars (`\s` = the five ASCII whitespace chars +
  *    space; `trim` strips spaces only, which are already separators).
  *  - `length()` counts CODE POINTS (`UTF8String.numChars`), so token
  *    and text lengths walk code points here, not UTF-16 units.
  *  - `split(c, "\n")` (limit −1) keeps a trailing empty line — the
  *    line count is #newlines + 1, including trailing.
  *  - `rlike("^[-*•]")` ≡ first code point of the space-trimmed line
  *    ∈ {-, *, U+2022} (`^` without MULTILINE matches only at the
  *    start, no terminator interplay); `rlike("(\\.\\.\\.|…)$")` ≡ the
  *    trimmed line ends with "..." or U+2026 AFTER skipping at most
  *    ONE trailing line terminator — Java `$` without MULTILINE also
  *    matches immediately before a FINAL \r, \u0085, \u2028 or \u2029
  *    (\n cannot survive the split), so a trimmed line ending "...\r"
  *    (CRLF text split on \n) counts as an ellipsis line in the
  *    composable form and must count here too (round-17 advice fix;
  *    CurationSpec carries \r-terminated parity edges).
  *  - `regexp_replace(c, "\\.\\.\\.", "")`'s length delta ≡ 3 × the
  *    non-overlapping left-to-right "..." count (skip-3 scan).
  *  - the stopword hit count compares the LOWERCASED token against
  *    the pure-ASCII stopword set; tokens longer than the longest
  *    stopword cannot match, and no Unicode case mapping produces a
  *    pure-ASCII stopword from a token of different code-point length
  *    (1→many mappings always emit non-ASCII combining marks), so the
  *    2..4-char guard is exact, and ASCII lowercasing suffices for
  *    candidates that are pure ASCII (non-ASCII chars never lowercase
  *    into [a-z] letters used by these stopwords, U+212A→k aside —
  *    and no stopword contains 'k').
  *  - division operands are exact small integers in doubles, so each
  *    ratio is the same single double division the composable form
  *    performs; null-on-empty (0/0) is reproduced per field, and a
  *    NULL input yields a null struct, which field extraction and
  *    `gopherKeep`'s coalesce treat identically to the composable
  *    form's struct of null fields.
  */
case class GopherStatsExpr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = GopherStatsExpr.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${t.simpleString}")
    }

  override protected def withNewChildInternal(
      newChild: Expression): GopherStatsExpr = copy(child = newChild)

  // java regex \s — exactly the class the composable form splits on
  @inline private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val n = s.length

    // ---- token scan: words, code-point lengths, alpha, stop hits ----
    var nWords = 0L
    var sumLen = 0L
    var nAlpha = 0L
    var stopMask = 0 // bit i = GopherStopwords(i) seen (8 words)
    var i = 0
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        val start = i
        var chars = 0
        var hasAlpha = false
        var asciiOnly = true
        while (i < n && !isWs(s.charAt(i))) {
          val cp = s.codePointAt(i)
          if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z'))
            hasAlpha = true
          if (cp > 127) asciiOnly = false
          chars += 1
          i += Character.charCount(cp)
        }
        nWords += 1
        sumLen += chars
        if (hasAlpha) nAlpha += 1
        if (asciiOnly && chars >= 2 && chars <= 4) {
          val t = new java.lang.StringBuilder(4)
          var k = start
          while (k < i) {
            val c = s.charAt(k)
            t.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
            k += 1
          }
          val idx = GopherStatsExpr.Stopwords.indexOf(t.toString)
          if (idx >= 0) stopMask |= 1 << idx
        }
      }
    }

    // ---- char scan: '#' count and non-overlapping "..." count ----
    var nHash = 0L
    var dots3 = 0L
    var j = 0
    while (j < n) {
      val c = s.charAt(j)
      if (c == '#') { nHash += 1; j += 1 }
      else if (c == '.' && j + 2 < n && s.charAt(j + 1) == '.' &&
        s.charAt(j + 2) == '.') { dots3 += 1; j += 3 }
      else j += 1
    }

    // ---- line scan: count, bullet starts, ellipsis ends ----
    var nLines = 0L
    var bullets = 0L
    var ells = 0L
    var lineStart = 0
    var m = 0
    while (m <= n) {
      if (m == n || s.charAt(m) == '\n') {
        nLines += 1
        // space-trim the line (Spark `trim` strips ' ' only)
        var a = lineStart
        var b = m
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        if (a < b) {
          val c0 = s.codePointAt(a)
          if (c0 == '-' || c0 == '*' || c0 == 0x2022) bullets += 1
          // Java `$` (no MULTILINE) matches before ONE final line
          // terminator, so the ellipsis test looks past it (class doc)
          val e = if (C4KeptLinesExpr.isLineTerm(s.charAt(b - 1))) b - 1 else b
          if (e > a && (s.charAt(e - 1) == '\u2026' ||
            (e - a >= 3 && s.charAt(e - 1) == '.' && s.charAt(e - 2) == '.' &&
              s.charAt(e - 3) == '.'))) ells += 1
        }
        lineStart = m + 1
      }
      m += 1
    }

    val nwD = nWords.toDouble
    val empty = nWords == 0L
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        nWords,
        if (empty) null else sumLen.toDouble / nwD,
        if (empty) null else (nHash + dots3).toDouble / nwD,
        bullets.toDouble / nLines.toDouble,
        ells.toDouble / nLines.toDouble,
        if (empty) null else nAlpha.toDouble / nwD,
        java.lang.Long.bitCount(stopMask).toLong))
  }
}

object GopherStatsExpr {
  /** Field order/types mirror the composable struct exactly. */
  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType),
    StructField("mean_word_len", DoubleType),
    StructField("symbol_ratio", DoubleType),
    StructField("bullet_ratio", DoubleType),
    StructField("ellipsis_ratio", DoubleType),
    StructField("alpha_ratio", DoubleType),
    StructField("n_stop_hits", LongType)))

  private[functions] val Stopwords: IndexedSeq[String] =
    TextFunctions.GopherStopwords.toIndexedSeq
}
