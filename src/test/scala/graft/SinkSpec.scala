package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Sink roundtrip: query results written as parquet read back identical
  * (the write path Verify.scala and any production pipeline rely on).
  */
class SinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet write/read roundtrip preserves a query result") {
    val out = Files.createTempDirectory("graft-sink").toString
    val df = SparkEntry.queries("q06_group_scalar")(spark, TestSpark.sf)
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema === df.schema)
    val a = df.collect().map(_.toSeq.toList).sortBy(_.toString)
    val b = back.collect().map(_.toSeq.toList).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("partitioned-by-key parquet sink prunes on read") {
    val out = Files.createTempDirectory("graft-sink-part").toString
    Tables
      .lineitem(spark, TestSpark.sf)
      .select("l_returnflag", "l_quantity")
      .write
      .mode("overwrite")
      .partitionBy("l_returnflag")
      .parquet(out)
    val pruned = spark.read.parquet(out).where("l_returnflag = 'R'")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(
      pruned.count() === Tables
        .lineitem(spark, TestSpark.sf)
        .where("l_returnflag = 'R'")
        .count())
  }
}
