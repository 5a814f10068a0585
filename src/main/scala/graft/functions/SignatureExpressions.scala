package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the dedup signature hot loops
  * (brief preference order (b): custom Expression over UDF).
  *
  * Why: the composable forms fold k=32 (minhash) / 64 (simhash)
  * higher-order-function trees over the same array attribute. Each HOF
  * evaluates an interpreted lambda per element (closures never enter
  * whole-stage codegen), so signature computation pays k interpreted
  * array traversals per row — AND the giant expression tree dominates
  * first-run codegen/JIT time (profiled: q14 cold run 17 s vs 3.4 s
  * steady-state). These expressions do ONE tight JVM loop per row.
  *
  * Bit parity with the composable forms is exact and spec-asserted:
  *  - minhash: `xxhash64(lit(i), h)` ≡ `XXH64.hashLong(h,
  *    XXH64.hashInt(i, 42L))` (Spark's XxHash64 folds fields
  *    left-to-right from seed 42; the int literal folds via hashInt),
  *    so per-function seeds are precomputed once and each element costs
  *    one `hashLong`.
  *  - simhash: bit j of the result = sign of Σ over tokens of
  *    (bit j set ? +1 : -1) — identical vote math, 64 counters in one
  *    pass instead of 64 `aggregate` passes.
  */
object SignatureExpressions {

  val MinHashName = "graft_minhash_sig"
  val SimHashName = "graft_simhash64"
  val ShingleHashName = "graft_shingle_hashes"

  /** Fold a literal integer argument (the SQL-facing parameter of the
    * parameterized expressions); rejects non-foldable args loudly.
    */
  private def intArg(name: String, e: Expression): Int = {
    require(e.foldable, s"$name expects a literal integer argument")
    val folded = e.eval()
    require( // a foldable NULL would otherwise NPE with no context
      folded != null,
      s"$name argument must be a non-null literal integer")
    val v = folded.asInstanceOf[Number].intValue()
    // reject at analysis time — k=0 minhash / n=0 shingles would otherwise
    // build an expression that only fails (or degenerates) at eval
    require(v >= 1, s"$name argument must be >= 1, got $v")
    v
  }

  /** Single source of truth for the expression builders — used by both
    * the per-session temp registration below and GraftExtensions'
    * SQL-extension injection, so the two paths cannot diverge.
    */
  val minHashBuilder: Seq[Expression] => Expression =
    exprs => MinHashSignatureExpr(exprs(0), intArg(MinHashName, exprs(1)))
  val simHashBuilder: Seq[Expression] => Expression =
    exprs => SimHash64Expr(exprs(0))
  val shingleHashBuilder: Seq[Expression] => Expression =
    exprs => ShingleHashesExpr(exprs(0), intArg(ShingleHashName, exprs(1)))

  /** Idempotent per-session registration (temp function registry) —
    * mirrors [[VectorExpressions.register]].
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHashName, minHashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SimHashName, simHashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShingleHashName, shingleHashBuilder, "built-in")
  }

  /** k-minima minhash signature over a base-hash array attribute —
    * requires [[register]] on the session first.
    */
  def minHashFast(baseHashes: Column, k: Int): Column =
    call_function(MinHashName, baseHashes, lit(k))

  /** One-pass 64-bit simhash over a token-hash array attribute —
    * requires [[register]] on the session first.
    */
  def simHashFast(tokenHashes: Column): Column =
    call_function(SimHashName, tokenHashes)

  /** Distinct character-n-gram hashes of a (normalized) string in one
    * linear pass — requires [[register]] on the session first.
    */
  def shingleHashesFast(normStr: Column, n: Int): Column =
    call_function(ShingleHashName, normStr, lit(n))
}

/** string → array<long>: xxhash64 of every DISTINCT character n-gram, in
  * first-occurrence order. Replaces `shingleBaseHashes(shinglesOf(s, n))`
  * on hot paths, which is quadratic: each `substr(i, n)` walks the
  * UTF8String from byte 0 to find character i (O(len) per shingle →
  * O(len²) per document), and the distinct string-shingle array
  * materializes ~len × n bytes per row. This expression walks the code
  * points ONCE, hashes each n-char byte window in place
  * (`XXH64.hashUnsafeBytes`, seed 42 = what `xxhash64(str)` computes),
  * and never materializes a shingle string. Dedup is by hash value —
  * identical to string dedup modulo ~2⁻⁶⁴ collisions, and downstream
  * consumers (minhash, jaccard-on-hashes, min-fingerprint) already treat
  * the hash as the shingle identity.
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    // ONE walk over the code points with a RING of the last n+1 char
    // start offsets — window k spans chars [k, k+n), so when char c's
    // start byte is found, window c−n ends exactly there. A flat
    // offsets array would allocate nBytes+1 ints per row (~4× the
    // document, pure per-row garbage on the dedup hot path).
    val ring = new Array[Int](n + 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var c = 0 // chars seen
    var i = 0
    while (i < nBytes) {
      ring(c % (n + 1)) = i
      if (c >= n) {
        val b0 = ring((c - n) % (n + 1))
        seen.add(XXH64.hashUnsafeBytes(base, off + b0, i - b0, 42L))
      }
      c += 1
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
    }
    if (c < n) return new GenericArrayData(Array.emptyLongArray)
    val last0 = ring((c - n) % (n + 1)) // final window ends at nBytes
    seen.add(XXH64.hashUnsafeBytes(base, off + last0, nBytes - last0, 42L))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = SignatureExpressions.ShingleHashName
}

/** array<long> base hashes → array<long> of `numHashes` minima, where
  * hash function i is `xxhash64(lit(i), h)`. Empty input → all-null
  * signature (parity with `array_min` of an empty array).
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint>, got ${t.simpleString}")
    }

  // seed for function i: XxHash64's fold of the leading lit(i) field —
  // lit(i) is an INT literal, so the fold step is hashInt, not hashLong
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      // null elements are SKIPPED (ignore-null, the count(col)
      // convention) — our shingle/token pipelines never produce them
      // (containsNull=false at the source; parquet round-trips only
      // widen the schema), so this only shapes direct SQL calls, where
      // reading the null slot as 0 and hashing it would be silent
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var j = 0
        while (j < numHashes) {
          val v = XXH64.hashLong(h, seeds(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) return new GenericArrayData(new Array[Any](numHashes))
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = SignatureExpressions.MinHashName
}

/** array<long> token hashes → 64-bit simhash (sign of per-bit votes).
  * Empty input → 0L (all votes are -1 ties → all bits clear), matching
  * the composable form.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      // null tokens are skipped, not read as 0 (MinHashSignatureExpr's
      // ignore-null convention — a 0-hash would cast 64 phantom votes)
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = SignatureExpressions.SimHashName
}
