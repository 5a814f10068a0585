package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch — the bounded-state, mergeable twin
  * of exact `value_counts` / top-k (q91).
  *
  * Exact top-k over a 100 TB token stream shuffles one partial count
  * per DISTINCT token per partition — the exchange scales with
  * vocabulary size (billions of web n-grams). A Misra–Gries summary is
  * a hard-capped table of k counters with the classic guarantees
  * (Misra & Gries 1982; merge form Agarwal et al., "Mergeable
  * Summaries", PODS'12):
  *
  *  - undercount only: est(x) ≤ true(x) ≤ est(x) + N/(k+1)
  *  - every item with true frequency > N/(k+1) is IN the summary
  *  - summaries MERGE: combine tables, subtract the (k+1)-th largest
  *    count, drop ≤0 — the merged summary keeps the same error bound,
  *    so per-shard / per-day summaries roll up without rescanning
  *    (the [[Sketches]] HLL argument, applied to frequencies).
  *
  * Implemented as a typed [[Aggregator]] (the custom-UDAF surface):
  * partial aggregation runs map-side, the exchange carries one ≤k-entry
  * map per partition, merge is associative.
  */
object HeavyHitters {

  /** Aggregation buffer/output: the counter table. A case class (not a
    * bare Map) so the product encoder serializes it without Kryo.
    */
  case class MGSummary(counters: Map[String, Long]) {
    /** Total stream length is tracked OUTSIDE the sketch (a plain
      * count(*) alongside) — the summary itself stays k-bounded.
      */
    def topK(n: Int): Seq[(String, Long)] =
      counters.toSeq.sortBy { case (t, c) => (-c, t) }.take(n)
  }

  /** Decrement-all step shared by reduce (by 1) and merge (by the
    * (k+1)-th count): subtract `d`, drop non-positive counters.
    */
  private def shrink(m: Map[String, Long], d: Long): Map[String, Long] =
    if (d <= 0) m
    else m.collect { case (t, c) if c > d => t -> (c - d) }

  /** One MG insertion (batch reduce AND streaming state update share
    * this): count if tracked, admit if room, else decrement-all.
    */
  def insert(m: Map[String, Long], token: String, k: Int): Map[String, Long] =
    if (token == null) m
    else if (m.contains(token)) m.updated(token, m(token) + 1L)
    else if (m.size < k) m.updated(token, 1L)
    else shrink(m, 1L) // classic decrement-all on overflow

  /** Merge two MG tables — the mergeable-summaries reduction that
    * preserves the N/(k+1) bound: combine, subtract the (k+1)-th
    * largest count, drop ≤0.
    */
  def mergeTables(
      a: Map[String, Long],
      b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else shrink(combined, combined.values.toSeq.sortBy(-_).apply(k))
  }

  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, MGSummary, MGSummary] {

    override def zero: MGSummary = MGSummary(Map.empty)

    override def reduce(b: MGSummary, token: String): MGSummary =
      MGSummary(insert(b.counters, token, k))

    override def merge(a: MGSummary, b: MGSummary): MGSummary =
      MGSummary(mergeTables(a.counters, b.counters, k))

    override def finish(r: MGSummary): MGSummary = r

    override def bufferEncoder: Encoder[MGSummary] =
      ExpressionEncoder[MGSummary]()

    override def outputEncoder: Encoder[MGSummary] =
      ExpressionEncoder[MGSummary]()
  }

  /** Column aggregate: Misra–Gries summary of a string column. */
  def mgSummary(c: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k)).apply(c)

  /** EXACT heavy hitters at or above rational support
    * `supportNum/supportDen` in two passes — the scalable exact form of
    * `value_counts()` filtered to frequent keys.
    *
    * A one-pass exact `groupBy(key).count()` over 100 TB shuffles one
    * partial count per DISTINCT key per partition — the exchange scales
    * with vocabulary size. Here pass 1 computes a global Misra–Gries
    * summary (the exchange carries one ≤k-entry table per partition) plus
    * the exact stream length; the classic guarantee puts every key with
    * true count > N/(k+1) IN the summary, so requiring
    * (k+1)·supportNum > supportDen makes the ≤k candidate keys a provable
    * superset of every key at support. Pass 2 rescans once with a
    * codegen'd `InSet` filter on the candidates (≤k literals — no join, no
    * extra exchange beyond a ≤k-group aggregation) and counts them
    * exactly. The support filter compares integers
    * (cnt·supportDen ≥ N·supportNum — no floating threshold), so the
    * output is EXACTLY what the full groupBy would return.
    *
    * The driver materializes only the ≤k-entry summary row (bounded).
    */
  def exactHeavyHitters(
      df: DataFrame,
      keyCol: String,
      supportNum: Long,
      supportDen: Long,
      k: Int = 256): DataFrame = {
    require(supportNum > 0 && supportDen > 0, "support must be positive")
    require(
      (k + 1).toLong * supportNum > supportDen,
      s"capacity $k cannot certify support $supportNum/$supportDen: " +
        "need (k+1)*supportNum > supportDen for the MG superset guarantee")
    val key = col(keyCol).cast("string")
    // n = count(*) — INCLUDING null keys — so the support threshold
    // matches the SQL `GROUP BY key HAVING count(*) >= n*support` form
    // on data with null keys. (MG only tracks non-null keys; a larger N
    // only strengthens the superset guarantee, never weakens it.)
    val row = df
      .agg(mgSummary(key, k).as("mg"), count(lit(1)).as("n"))
      .select(map_keys(col("mg.counters")).as("cands"), col("n"))
      .collect()(0)
    val cands = row.getSeq[String](0)
    val n = row.getLong(1)
    // the NULL group rides the recount unconditionally: MG cannot
    // track null (insert skips it), but `GROUP BY key HAVING` returns
    // a null group when it clears support — recounting null directly
    // needs no MG superset guarantee, the count is exact by itself
    df.where(key.isInCollection(cands) || col(keyCol).isNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") * supportDen >= lit(n) * supportNum)
  }

  /** Approximate top-n frequent values of `valueCol` (optionally per
    * group): ONE partial+final aggregation whose exchange carries
    * ≤k-entry summaries, then an in-place explode of the final table.
    * `est` is the lower-bound estimate (true count ≤ est + N/(k+1)).
    */
  def approxTopK(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String] = Nil,
      k: Int = 64,
      topN: Int = 20): DataFrame = {
    val grouped =
      if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)
    val agged = grouped.agg(
      mgSummary(col(valueCol), k).as("mg"),
      count(col(valueCol)).as("n_total"))
    val exploded = agged
      .select(
        (keys.map(col) :+ col("n_total") :+
          explode(col("mg.counters")).as(Seq("value", "est"))): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("est").desc, col("value"))
    exploded
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= topN)
      .drop("__rn")
  }
}
