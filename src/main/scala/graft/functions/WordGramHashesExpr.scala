package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** string → array<long>: xxhash64 of every DISTINCT word n-gram, in
  * first-occurrence order — the fused form of q149's gram projection
  * ([[graft.operators.Dedup.duplicatedNgramFraction]]); the
  * [[GopherStatsExpr]] / [[ShingleHashesExpr]] recipe applied to word
  * n-grams. The composable form
  *
  * {{{
  * array_distinct(when(size(tk) >= n,
  *   transform(sequence(1, size(tk) - (n-1)),
  *     i => xxhash64(concat_ws(" ", slice(tk, i, n)))))
  *   .otherwise(array().cast("array<bigint>")))   // tk = tokens(text)
  * }}}
  *
  * evaluates an INTERPRETED lambda per gram (HOF closures never enter
  * whole-stage codegen), and each lambda invocation materializes a
  * slice array, a concat string and an UnsafeRow round trip. This
  * expression walks the text bytes once, hashes each window in place
  * where possible, and allocates nothing per gram but the hash.
  *
  * BIT PARITY with the composable form (spec-asserted in CurationSpec
  * over the corpus and edges); the equivalences relied on:
  *  - `tokens(c)` = `split(trim(c), "\\s+")` with an empty-array guard
  *    for `length(trim(c)) == 0`. `trim` strips ' ' only; Java split
  *    (limit −1) yields a LEADING empty token when the (space-trimmed)
  *    text starts with non-space whitespace, a TRAILING empty token
  *    when it ends with one, and no interior empties (`\s+` eats runs).
  *    Empty tokens participate in grams exactly as `concat_ws` joins
  *    them ("" contributes zero bytes between separators).
  *  - every `\s` byte is ASCII (0x09–0x0D, 0x20), so byte-level
  *    tokenization of the UTF-8 buffer is code-point safe and token
  *    bytes can be hashed without decoding.
  *  - `xxhash64(gram)` = `XXH64.hashUnsafeBytes(bytes, 42L)` over the
  *    gram's UTF-8 bytes; when all n−1 separators inside a window are
  *    a single ' ', the gram IS a contiguous slice of the input and is
  *    hashed IN PLACE (zero copy — the overwhelmingly common case for
  *    natural text); otherwise the window's bytes are assembled into a
  *    reusable buffer with single-space joints, which is precisely the
  *    `concat_ws(" ", ...)` byte sequence.
  *  - `array_distinct` keeps first occurrences in order — a
  *    LinkedHashSet reproduces that; dedup is on the 64-bit hash both
  *    here and downstream (the composable form's distinct also runs on
  *    the hashes).
  *  - null text → empty array, matching the composable guard chain
  *    (size(null) → null → when falls to otherwise), so `eval` is
  *    overridden — null never reaches a consumer.
  */
case class WordGramHashesExpr(
    child: Expression,
    n: Int,
    distinct: Boolean = true)
    extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, s"n-gram length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${t.simpleString}")
    }

  override protected def withNewChildInternal(
      newChild: Expression): WordGramHashesExpr = copy(child = newChild)

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  // the composable form returns [] for null text (see class doc), so
  // null must not propagate — hence eval, not nullSafeEval
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Empty else nullSafeEval(v)
  }

  @inline private def isWsByte(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    // space-trim (Spark `trim` strips ' ' only)
    var ts = 0
    var te = nBytes
    while (ts < te &&
      org.apache.spark.unsafe.Platform.getByte(base, off + ts) == 0x20)
      ts += 1
    while (te > ts &&
      org.apache.spark.unsafe.Platform.getByte(base, off + te - 1) == 0x20)
      te -= 1
    if (te == ts) return Empty // length(trim) == 0 → tokens() → []
    // tokenize: byte ranges per token + whether the separator AFTER
    // token j is exactly one ' ' (→ the gram is a contiguous slice)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var oneSpaceAfter = new Array[Boolean](16)
    var nTok = 0
    def push(a: Int, b: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
        oneSpaceAfter = java.util.Arrays.copyOf(oneSpaceAfter, nTok * 2)
      }
      starts(nTok) = a; ends(nTok) = b; nTok += 1
    }
    var i = ts
    var tokStart = ts // a leading \s byte yields the leading "" token
    while (i < te) {
      if (isWsByte(org.apache.spark.unsafe.Platform.getByte(base, off + i))) {
        push(tokStart, i)
        val runStart = i
        while (i < te && isWsByte(
          org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
        oneSpaceAfter(nTok - 1) = (i - runStart == 1) &&
          org.apache.spark.unsafe.Platform.getByte(base, off + runStart) == 0x20
        tokStart = i
      } else i += 1
    }
    push(tokStart, te) // trailing "" token iff text ends with \s
    if (nTok < n) return Empty
    // hash each window: in place when contiguous, else via a reusable
    // single-space-joined buffer (== concat_ws(" ", ...) bytes).
    // distinct=false keeps EVERY window's hash in window order (the
    // q46 bigram-frequency shape — counts need occurrences)
    val all: Array[Long] = if (distinct) null else new Array[Long](nTok - n + 1)
    val seen =
      if (distinct) new java.util.LinkedHashSet[java.lang.Long]() else null
    var buf: Array[Byte] = null
    var w = 0
    val lastW = nTok - n
    while (w <= lastW) {
      var contiguous = true
      var j = w
      while (contiguous && j < w + n - 1) {
        if (!oneSpaceAfter(j)) contiguous = false
        j += 1
      }
      val h =
        if (contiguous)
          XXH64.hashUnsafeBytes(
            base, off + starts(w), ends(w + n - 1) - starts(w), 42L)
        else {
          var len = n - 1 // the n-1 joining spaces
          var k = w
          while (k < w + n) { len += ends(k) - starts(k); k += 1 }
          if (buf == null || buf.length < len) buf = new Array[Byte](len)
          var p = 0
          k = w
          while (k < w + n) {
            val tl = ends(k) - starts(k)
            org.apache.spark.unsafe.Platform.copyMemory(
              base, off + starts(k), buf,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + p, tl)
            p += tl
            if (k < w + n - 1) { buf(p) = 0x20; p += 1 }
            k += 1
          }
          XXH64.hashUnsafeBytes(
            buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
        }
      if (distinct) seen.add(h) else all(w) = h
      w += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j2 = 0
    while (it.hasNext) { out(j2) = it.next(); j2 += 1 }
    new GenericArrayData(out)
  }

  override def prettyName: String = "graft_word_gram_hashes"
}

/** string → array<long>: the hash of EVERY n-token window, in window
  * order (windows at token positions 1..nTok−n+1) — the fused form of
  * [[graft.operators.Dedup.duplicateSpans]]' window projection
  * (q181/q182). The composable form paid TWO interpreted lambdas per
  * row: `transform(tokens, t => xxhash64(t))` (one interpreted
  * invocation per token) and the per-window
  * `xxhash64(element_at…× n)` battery. Parity relied on:
  *  - token hash = xxhash64(token) = `XXH64.hashUnsafeBytes` over the
  *    token's UTF-8 bytes, seed 42, hashed here in place on the input
  *    buffer (tokenization exactly as [[WordGramHashesExpr]]:
  *    space-trim, `\s` runs, phantom leading/trailing empties).
  *  - window hash = Spark's variadic `xxhash64(h_i, …, h_{i+n-1})` ≡
  *    left fold `acc = XXH64.hashLong(h_j, acc)` from seed 42 — the
  *    documented XxHash64 field fold ([[SignatureExpressions]]).
  *  - null text → empty array (the composable when-guard chain), so
  *    `eval` is overridden; `posexplode` of the result reproduces the
  *    (pos, gh) pairs with pos = index + 1.
  */
case class TokenWindowHashesExpr(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, s"window length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${t.simpleString}")
    }

  override protected def withNewChildInternal(
      newChild: Expression): TokenWindowHashesExpr = copy(child = newChild)

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Empty else nullSafeEval(v)
  }

  @inline private def isWsByte(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    var ts = 0
    var te = nBytes
    while (ts < te &&
      org.apache.spark.unsafe.Platform.getByte(base, off + ts) == 0x20)
      ts += 1
    while (te > ts &&
      org.apache.spark.unsafe.Platform.getByte(base, off + te - 1) == 0x20)
      te -= 1
    if (te == ts) return Empty
    // token hashes in one pass (ranges as in WordGramHashesExpr)
    var th = new Array[Long](16)
    var nTok = 0
    def push(a: Int, b: Int): Unit = {
      if (nTok == th.length) th = java.util.Arrays.copyOf(th, nTok * 2)
      th(nTok) = XXH64.hashUnsafeBytes(base, off + a, b - a, 42L)
      nTok += 1
    }
    var i = ts
    var tokStart = ts
    while (i < te) {
      if (isWsByte(org.apache.spark.unsafe.Platform.getByte(base, off + i))) {
        push(tokStart, i)
        while (i < te && isWsByte(
          org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
        tokStart = i
      } else i += 1
    }
    push(tokStart, te)
    if (nTok < n) return Empty
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w < out.length) {
      var acc = 42L
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(w + j), acc); j += 1 }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "graft_token_window_hashes"
}

object TokenWindowHashesExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Column form of the fused expression. */
  def ofColumn(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ExprBridge.column(
      TokenWindowHashesExpr(
        org.apache.spark.sql.graftbridge.ExprBridge.expression(c), n))

  /** Composable spec over a frame — verbatim the two-step projection
    * `duplicateSpans` used before round 17 (token-hash array projected
    * ONCE as an attribute, then the per-window variadic hash; nested
    * inline the token transform would re-evaluate per window,
    * O(tokens²) interpreted). Output: (idCol, gh array in window
    * order) — pos is the array index + 1.
    */
  def composableFrame(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(
      col(idCol),
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
        .as("__th"))
    val th = col("__th")
    def winHash(i: Column): Column =
      xxhash64((0 until n).map(j => element_at(th, (i + j).cast("int"))): _*)
    toks.select(
      col(idCol),
      when(
        size(th) >= n,
        transform(
          sequence(lit(1L), (size(th) - (n - 1)).cast("long")),
          i => winHash(i)))
        .otherwise(array().cast("array<bigint>"))
        .as("gh"))
  }
}

object WordGramHashesExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Column form of the fused expression. */
  def ofColumn(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ExprBridge.column(
      WordGramHashesExpr(
        org.apache.spark.sql.graftbridge.ExprBridge.expression(c), n))

  /** Non-distinct form: EVERY window's hash in window order — for
    * per-occurrence frequency counting (q46's top-bigram fraction).
    */
  def ofColumnAll(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ExprBridge.column(
      WordGramHashesExpr(
        org.apache.spark.sql.graftbridge.ExprBridge.expression(c),
        n,
        distinct = false))

  /** Composable spec of [[ofColumnAll]]: per-occurrence gram hashes —
    * verbatim `xxhash64(concat_ws(" ", bigram))` over
    * [[TextFunctions.bigramsOf]]-style windows, no dedup.
    */
  def composableAll(c: Column, n: Int): Column = {
    val tk = TextFunctions.tokens(c)
    when(
      size(tk) >= n,
      transform(
        sequence(lit(1), size(tk) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(tk, i, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** The original composable Column form — kept as the executable
    * SPECIFICATION the fused expression is differenced against
    * (CurationSpec parity test); this is verbatim what
    * `duplicatedNgramFraction` projected before round 17.
    */
  def composable(c: Column, n: Int): Column = {
    val tk = TextFunctions.tokens(c)
    array_distinct(
      when(
        size(tk) >= n,
        transform(
          sequence(lit(1), size(tk) - (n - 1)),
          i => xxhash64(concat_ws(" ", slice(tk, i, lit(n))))))
        .otherwise(array().cast("array<bigint>")))
  }
}
