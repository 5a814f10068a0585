package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, Tables}
import graft.sources.Bucketing

/** Dev-only smoke main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder(8)
      .config("spark.sql.warehouse.dir", "/tmp/graft-scratch-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"),
      "s_li", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, d).select("o_orderkey", "o_totalprice"),
      "s_ord", "o_orderkey", 4)
    val j = Bucketing.table(spark, "s_li").hint("merge")
      .join(Bucketing.table(spark, "s_ord"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    println("[scratch] shuffle-free=" + !plan.contains("Exchange hashpartitioning")
      + " bucketed=" + plan.contains("Bucketed: true")
      + " rows=" + j.count())
    spark.stop()
  }
}
