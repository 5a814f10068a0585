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

  test("winsorize clips at per-group bounds; approx twin stays within rank error") {
    // group a: 1..100 → p05 ≈ 5.95, p95 ≈ 95.05 (linear interpolation)
    val df = ((1 to 100).map(i => ("a", i.toLong, i.toDouble)) :+
      (("b", 999L, 7.0))) // single-value group: both bounds = the value
      .toDF("k", "id", "x")
    val out = Sampling.winsorize(df, "x", Seq("k"))
      .select(col("k"), col("id"), col("x_wins"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("a", 1L)) - 5.95) < 1e-9) // clipped up to p05
    assert(math.abs(out(("a", 100L)) - 95.05) < 1e-9) // clipped down
    assert(out(("a", 50L)) === 50.0) // interior untouched
    assert(out(("b", 999L)) === 7.0) // degenerate group is identity
    // approx twin: same shape, bounds within coarse tolerance of exact
    val approxOut = Sampling
      .winsorize(df, "x", Seq("k"), approx = true)
      .where(col("k") === "a")
      .agg(min("x_wins"), max("x_wins"))
      .as[(Double, Double)].first()
    assert(approxOut._1 >= 1.0 && approxOut._1 <= 10.0)
    assert(approxOut._2 >= 90.0 && approxOut._2 <= 100.0)
  }

  test("winsorize keeps and clips null-key rows (row-preserving)") {
    // a null group key must not silently drop rows: the null group
    // gets its own bounds and its rows come back clipped
    val df = (Seq((Some("a"), 1L, 1.0), (Some("a"), 2L, 100.0)) ++
      (1 to 10).map(i => (None: Option[String], 100L + i, i.toDouble)))
      .toDF("k", "id", "x")
    val out = Sampling.winsorize(df, "x", Seq("k"), lo = 0.0, hi = 0.5)
    assert(out.count() === 12L) // every input row survives
    val nullRows = out.where(col("k").isNull)
      .select("id", "x_wins")
      .as[(Long, Double)].collect().toMap
    assert(nullRows.size === 10)
    assert(nullRows(110L) === 5.5) // p50 of 1..10 clips the top
    assert(nullRows(101L) === 1.0)
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
