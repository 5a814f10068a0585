package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality-validated joins — pandas `merge(validate="one_to_one" |
  * "one_to_many" | "many_to_one")` (reference-adjacent surface: the
  * join that REFUSES to run on a violated key-uniqueness assumption
  * instead of silently multiplying rows — the classic silent-fanout bug
  * in feature pipelines).
  *
  * Distributed and lazy: each side that must be unique gets a per-key
  * count window plus an `assert_true` guard ANCHORED by a filter on the
  * guard's (always-null) result — the filter keeps Catalyst from
  * pruning the assertion away, no driver-side action or collect is
  * added, and the first violating row fails the job naming the
  * offending key. Cost: one extra hash exchange per validated side
  * (the price of actually checking; pandas builds a full index to do
  * the same).
  */
object ValidatedJoin {

  private def assertUnique(
      df: DataFrame,
      keys: Seq[String],
      side: String): DataFrame = {
    val n = count(lit(1)).over(Window.partitionBy(keys.map(col): _*))
    df.withColumn("__n", n)
      .where(
        assert_true(
          col("__n") === 1,
          concat(
            lit(s"merge validation failed: $side side has duplicate key ("),
            concat_ws(",", keys.map(col): _*),
            lit(")"))).isNull)
      .drop("__n")
  }

  /** @param validate one_to_one | one_to_many | many_to_one |
    *                 many_to_many (pandas spelling; many_to_many checks
    *                 nothing and exists for API parity)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      how: String,
      validate: String): DataFrame = {
    val (checkLeft, checkRight) = validate match {
      case "one_to_one" => (true, true)
      case "one_to_many" => (true, false)
      case "many_to_one" => (false, true)
      case "many_to_many" => (false, false)
      case other =>
        throw new IllegalArgumentException(
          s"unknown validate mode '$other' (pandas merge spelling expected)")
    }
    val l = if (checkLeft) assertUnique(left, keys, "left") else left
    val r = if (checkRight) assertUnique(right, keys, "right") else right
    l.join(r, keys, how)
  }
}
