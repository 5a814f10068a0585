package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GlobalRank

/** The scalable global rank must equal the single-partition window
  * form on any input partitioning, and must never plan the Exchange
  * SinglePartition it exists to avoid.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.sf)
    .select(col("doc_id"), col("n_chars"))

  private def oracle: Map[Long, Long] = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn(
        "rk",
        row_number().over(
          Window.orderBy(col("n_chars").desc, col("doc_id").asc)))
      .select("doc_id", "rk")
      .as[(Long, Long)]
      .collect()
      .toMap
  }

  test("matches the window oracle on every input partitioning") {
    val expect = oracle
    for (parts <- Seq(1, 3, 16)) {
      val got = GlobalRank
        .withGlobalRowNumber(
          docs.repartition(parts),
          Seq(col("n_chars").desc, col("doc_id").asc))
        .select("doc_id", "rk")
        .as[(Long, Long)]
        .collect()
        .toMap
      assert(got === expect, s"mismatch at input parts=$parts")
    }
  }

  test("ranks are a 1..n permutation with no duplicates") {
    val rks = GlobalRank
      .withGlobalRowNumber(
        docs,
        Seq(col("n_chars").desc, col("doc_id").asc))
      .select("rk")
      .as[Long]
      .collect()
      .sorted
    assert(rks.toSeq === (1L to rks.length).toSeq)
  }

  test("empty input yields an empty, schema-stable result") {
    val out = GlobalRank.withGlobalRowNumber(
      docs.where(lit(false)),
      Seq(col("doc_id").asc))
    assert(out.columns.contains("rk"))
    assert(out.count() === 0)
  }
}
