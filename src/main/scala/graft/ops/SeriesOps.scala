package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}

/** O3 / O4 — `Series.parallel_map(func)` and
  * `Series.parallel_apply(func, args, **kwargs)`.
  * Reference: pandarallel/core.py:548-551, data_types/series.py.
  *
  * A pandas Series maps to a single value column (plus whatever key
  * columns identify the row — pandas' index). `map` and `apply` have
  * identical element-wise semantics; `apply` additionally forwards extra
  * positional/keyword arguments to the function
  * (tests/test_pandarallel.py:248-253). In Scala both "extra args" and
  * "kwargs" are simply values closed over by the lambda / baked into the
  * expression — the compiler enforces the serializability contract that
  * dill handles dynamically in the reference (core.py:265).
  *
  * Declarative path ([[mapExpr]]) stays inside whole-stage codegen; the
  * typed path ([[mapTyped]]) is the genuine black-box escape hatch.
  * Both are narrow (no shuffle), order-preserving per partition.
  */
object SeriesOps {

  /** Element-wise expression over a value column, keys carried through. */
  def mapExpr(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String],
      outName: String)(f: Column => Column): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(keys.map(col) :+ f(col(valueCol)).as(outName): _*)
  }

  /** O4: same, with explicit extra arguments threaded to the function —
    * mirrors `parallel_apply(func, args=…, **kwargs)`.
    */
  def applyExpr[A](
      df: DataFrame,
      valueCol: String,
      keys: Seq[String],
      outName: String,
      args: A)(f: (Column, A) => Column): DataFrame =
    mapExpr(df, valueCol, keys, outName)(c => f(c, args))

  /** Black-box element function over a typed column. */
  def mapTyped[I: Encoder, O: Encoder](ds: Dataset[I])(f: I => O): Dataset[O] =
    ds.map(f)
}
