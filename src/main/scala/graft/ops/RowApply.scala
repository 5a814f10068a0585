package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}

/** O1, axis=1 — `DataFrame.parallel_apply(func, axis=1)`:
  * the user function sees one row at a time and produces a value (or a
  * row). Reference: pandarallel/core.py:523-525, data_types/dataframe.py:11-51.
  *
  * Spark-first realization:
  *  - [[exprApply]] — when the per-row function is expressible as Column
  *    expressions, declare it; Catalyst fuses it into whole-stage codegen
  *    and pushes referenced-column pruning into the parquet scan. This is
  *    the path every declared query uses.
  *  - [[apply]] — the genuinely-black-box path: `Dataset.map(Row => T)`.
  *    Exits codegen (like every reference UDF exits C into Python), but
  *    stays fully distributed: one narrow stage, no shuffle.
  *
  * The reference partitions rows into contiguous chunks and concatenates
  * results in chunk order (dataframe.py:13-22,45-51); Spark partitions are
  * the chunks and both paths below are order-preserving per partition
  * (narrow transformations), so the reassembly contract holds without any
  * sort.
  */
object RowApply {

  /** Declarative row UDF: each output column is an expression over the
    * input row. Whole-stage-codegen'd, scan-pruned.
    */
  def exprApply(df: DataFrame)(outputs: (String, Column)*): DataFrame =
    df.select(outputs.map { case (n, c) => c.as(n) }: _*)

  /** Black-box row UDF over typed rows. With a counter attached, ticks
    * once per row — the reference's `apply` accounting (one unit per UDF
    * invocation, core.py:228-235); read it live via
    * [[graft.progress.Progress.withConsoleBar]].
    */
  def apply[T: Encoder](
      df: DataFrame,
      counter: Option[graft.progress.Progress.RowCounter] = None)(
      f: Row => T): Dataset[T] =
    counter match {
      case None    => df.map(f)(implicitly[Encoder[T]])
      case Some(c) => df.map { r => c.tick(); f(r) }(implicitly[Encoder[T]])
    }
}
