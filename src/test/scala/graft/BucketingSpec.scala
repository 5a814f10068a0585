package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed co-located join: both sides bucketed on the join key must
  * join without any Exchange in the physical plan, and produce the same
  * result as the shuffled join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join on the bucket key is exchange-free and result-identical") {
    val li = Tables
      .lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity")
    val ord = Tables
      .orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")

    Bucketing.writeBucketed(li, "graft_li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "graft_ord_b", "o_orderkey", 8)

    // at test scale the planner would (rightly) broadcast — force the
    // sort-merge path to observe the bucketed layout's shuffle-freeness
    val joined = Bucketing
      .table(spark, "graft_li_b")
      .hint("merge")
      .join(
        Bucketing.table(spark, "graft_ord_b"),
        col("l_orderkey") === col("o_orderkey"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(
      !plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(plan.contains("SortMergeJoin"))
    assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")

    val viaBuckets = joined.agg(sum("l_quantity"), count(lit(1))).head()
    val viaShuffle = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(sum("l_quantity"), count(lit(1)))
      .head()
    assert(viaBuckets.getLong(1) === viaShuffle.getLong(1))
    assert(
      math.abs(viaBuckets.getDouble(0) - viaShuffle.getDouble(0)) < 1e-6)
  }
}
