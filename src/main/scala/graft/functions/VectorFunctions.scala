package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built from Spark's
  * higher-order functions (`zip_with` / `aggregate`) — no UDFs, so the
  * parquet scan only reads the embedding column and plans stay
  * declarative. NOTE: HOF lambdas evaluate interpreted per element
  * (they never enter whole-stage codegen) — these are the composable
  * reference forms; hot paths use the native single-pass expressions
  * ([[VectorExpressions.cosineFast]], SignatureExpressions), which are
  * bit-parity-tested against these.
  *
  * Beyond the reference surface (pandarallel has no vector ops); part of
  * the training-data-pipeline extension set (similarity search, near-dup).
  * Elements are cast to double before arithmetic so results are
  * reproducible across engines regardless of the stored float32 type.
  */
object VectorFunctions {

  /** Cast to array<double> for stable arithmetic. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Random-hyperplane (SimHash) LSH signature for cosine similarity:
    * `nBits` sign bits of projections onto deterministic pseudo-random
    * hyperplanes, packed into a long. Hyperplane components are derived
    * from a hash of (bit, dim) — fully deterministic, no driver-side
    * randomness, one expression per row (interpreted HOF evaluation).
    *
    * At scale: signatures bucket vectors so candidate generation is a
    * hash-partition join on the signature (or signature bands) instead of
    * an O(n^2) cross join.
    */
  def hyperplaneSignature(vec: Column, nBits: Int, seed: Int = 42): Column = {
    require(nBits >= 1 && nBits <= 63, "nBits in [1,63]")
    val v = asDouble(vec)
    val bits = (0 until nBits).map { b =>
      // projection = sum_i v[i] * h(b, i), h in [-0.5, 0.5)
      val proj = aggregate(
        zip_with(
          v,
          sequence(lit(0), size(v) - 1),
          (x, i) =>
            x * (pmod(hash(lit(b), i, lit(seed)).cast("double"), lit(1000.0)) /
              lit(1000.0) - lit(0.5))),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
