package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deterministic sample selects identical rows across runs and partitionings") {
    val docs = Tables.documents(spark, TestSpark.sf)
    def ids(p: Int) = Sampling
      .deterministic(docs.repartition(p), "text", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val a = ids(1)
    assert(a === ids(13))
    assert(a === ids(4))
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("stratified rates apply per stratum") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = Sampling.stratified(
      docs, "text", "lang", Map("en" -> 0.0), defaultRate = 1.0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(!langs.contains("en"))
    val nonEn = docs.where(col("lang") =!= "en").count()
    assert(out.count() === nonEn)
  }

  test("vocabulary counts match a hand computation on a tiny corpus") {
    val df = Seq((1L, "a b a"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val v = Sampling.vocabulary(df, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(v("a") === ((2L, 1L)))
    assert(v("b") === ((2L, 2L)))
    assert(v("c") === ((1L, 1L)))
    assert(v.size === 3)
  }
}
