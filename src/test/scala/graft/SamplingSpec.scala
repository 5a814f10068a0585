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

  test("hashSplit: covering, stable under corpus growth, partition-invariant") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val full = Sampling.hashSplit(docs, "text", w, seed = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every row assigned, only declared splits, roughly right proportions
    assert(full.size === docs.count())
    assert(full.values.toSet.subsetOf(Set("train", "val", "test")))
    val trainFrac = full.values.count(_ == "train").toDouble / full.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // growth stability: assignments on a subset are a restriction of the
    // full assignment (rand() splits fail this)
    val sub = Sampling
      .hashSplit(docs.where($"doc_id" < 200), "text", w, seed = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, s) => full(id) == s })
    // partition invariance
    val rep = Sampling.hashSplit(docs.repartition(13), "text", w, seed = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(rep === full)
    // a different seed actually moves documents
    val other = Sampling.hashSplit(docs, "text", w, seed = "s2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(other.exists { case (id, s) => full(id) != s })
  }

  test("seededShuffle: dense per-shard positions, deterministic, seed-sensitive") {
    val docs = Tables.documents(spark, TestSpark.sf)
    def run(p: Int, seed: String) = Sampling
      .seededShuffle(docs.repartition(p), "text", nShards = 4, seed = seed,
        tieBreak = Seq($"doc_id"))
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val a = run(1, "s")
    assert(a === run(7, "s")) // partitioning-invariant order
    // positions are dense 0..n-1 within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === rows.indices.toSeq)
    }
    // all shards populated, sizes roughly uniform
    val sizes = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set(0, 1, 2, 3))
    assert(sizes.values.min > a.size / 8)
    // the seed changes the order
    assert(run(1, "s2") !== a)
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

  test("weightedSampleK: exact k, partition-invariant, favors heavy weights") {
    val rows = (1 to 400).map { i =>
      val hot = i % 4 == 0 // every 4th doc gets 20x the weight
      (i.toLong, s"doc body $i", if (hot) 200.0 else 10.0)
    }
    val df = rows.toDF("doc_id", "text", "w")
    def ids(parts: Int): Set[Long] = Sampling
      .weightedSampleK(
        df.repartition(parts), "text", col("w"), k = 80, seed = "s",
        tieBreak = Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    val sel = ids(1)
    assert(sel.size === 80) // exactly k survive
    assert(sel === ids(7)) // pure function of content, not partitioning
    // 100 hot docs carry 200·100 of the 200·100+10·300 = 23k total
    // weight (~87%); under E–S they must dominate the selection. The
    // corpus is fixed and the draw deterministic, so this is a hard
    // assertion, not a flaky statistical one.
    val hotKept = sel.count(_ % 4 == 0)
    assert(hotKept >= 55, s"only $hotKept/80 heavy docs kept")
    // k >= n degenerates to "everything with positive weight"
    val all = Sampling
      .weightedSampleK(df, "text", col("w"), k = 1000, seed = "s")
    assert(all.count() === 400L)
    // w <= 0 / null means "never sample"
    val guarded = Sampling.weightedSampleK(
      df.withColumn("w", when(col("doc_id") <= 390, col("w"))),
      "text", col("w") - 10.0, k = 1000, seed = "s")
    assert(guarded.count() === 97L) // 100 hot minus nulled 392/396/400
  }

  test("weightedSamplePerGroup: per-group quota, small groups intact") {
    val df = (1 to 90).map { i =>
      (i.toLong, s"body $i", s"g${i % 3}", if (i % 9 == 0) 500.0 else 5.0)
    }.toDF("doc_id", "text", "g", "w")
    val out = Sampling
      .weightedSamplePerGroup(
        df, "text", col("w"), Seq(col("g")), k = 6, seed = "s",
        tieBreak = Seq(col("doc_id")))
      .select("g", "doc_id").as[(String, Long)].collect()
    assert(out.length === 18)
    assert(out.groupBy(_._1).forall(_._2.length == 6)) // 6 per group
    // heavy docs (w=500, all in g0: ids 9,18,...,90) dominate g0's quota
    val g0Heavy = out.filter(_._1 === "g0").count(_._2 % 9 == 0)
    assert(g0Heavy >= 4, s"only $g0Heavy/6 heavy docs in g0's sample")
    // a group smaller than k comes back whole
    val tiny = Seq((1L, "a b", "x", 1.0), (2L, "c d", "x", 1.0))
      .toDF("doc_id", "text", "g", "w")
    assert(Sampling.weightedSamplePerGroup(
      tiny, "text", col("w"), Seq(col("g")), k = 6).count() === 2L)
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
