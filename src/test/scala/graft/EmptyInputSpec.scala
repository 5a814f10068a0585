package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomJoin, Dedup, HeavyHitters, Upsert}
import graft.ops.GroupApply

/** Degenerate-input behavior: every operator must return an EMPTY (or
  * identity) result on empty input — never throw. An hourly pipeline's
  * quiet-period batch is empty; an operator that crashes on it pages
  * someone at 3am.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def noKV = Seq.empty[(Long, Double)].toDF("k", "v")

  test("dedup family: empty corpus in, empty out") {
    assert(Dedup.exact(noDocs, "text", "doc_id").count() === 0)
    assert(
      Dedup.duplicatedNgramFraction(noDocs, "doc_id", "text", 5).count() === 0)
    assert(
      Dedup
        .minHashNearDup(noDocs, "text", "doc_id")
        .count() === 0)
    assert(
      Dedup
        .resolveComponents(
          Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
        .count() === 0)
  }

  test("semantic dedup family: empty embedding frames in, empty out") {
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(
      Dedup
        .embeddingNearDupExact(noVecs, "embedding", "vec_id", 0.5)
        .count() === 0)
    assert(
      Dedup
        .embeddingNearDupBanded(noVecs, "embedding", "vec_id")
        .count() === 0)
    // survivors of an empty corpus = the empty corpus
    assert(
      Dedup
        .semanticDedup(noVecs, "embedding", "vec_id", k = 4, threshold = 0.5)
        .count() === 0)
    // an empty micro-batch against a live index: nothing flagged,
    // nothing crashes (the quiet-period case of EmbedIngest)
    val dir = java.nio.file.Files
      .createTempDirectory("emb-empty-").toString + "/emb"
    graft.streaming.EmbedIngest.ingestBatch(
      Seq((1L, Array.tabulate(8)(_.toFloat))).toDF("vec_id", "embedding"),
      dir, "embedding", "vec_id", batchId = 0L)
    graft.streaming.EmbedIngest.ingestBatch(
      noVecs, dir, "embedding", "vec_id", batchId = 1L)
    assert(
      graft.streaming.EmbedIngest
        .ingestedIds(spark, dir).get.count() === 1)
    assert(
      Dedup
        .embProbeIndex(noVecs, "embedding", "vec_id", dir)
        .count() === 0)
  }

  test("video decode: empty asset frame in, empty out") {
    import graft.multimodal.Multimodal
    val noAssets = Seq.empty[(Long, Array[Byte])].toDF("id", "data")
    assert(Multimodal.decodeVideo(noAssets).count() === 0)
  }

  test("scan/window family: empty input in, empty out, never a crash") {
    import graft.ops.Windows
    // two-phase prefix scans: zero partitions of totals, empty result
    assert(
      Windows
        .prefixSumScalable(noKV, "k", "v", "cum")
        .count() === 0)
    assert(
      Windows
        .prefixScanScalable(noKV, "k", "v", "cum", "max")
        .count() === 0)
    // streaming per-key recursions and the table window
    val ek = Seq.empty[(String, Long, Double, Double)].toDF("k", "i", "x", "y")
    assert(
      Windows
        .ewmCov(ek, "x", "y", Seq(col("i")), Seq("k"), 0.5, "c")
        .count() === 0)
    assert(
      Windows
        .rollingTableApply(
          ek, Seq(col("x"), col("y")), Seq(col("i")), Seq(col("k")), 3,
          "out")(m => Some(m.head.sum))
        .count() === 0)
    // audio decode: empty asset table, and decontaminate identities
    val noAssets = Seq.empty[(Long, Array[Byte])].toDF("id", "data")
    assert(graft.multimodal.Multimodal.decodeAudio(noAssets).count() === 0)
    assert(
      Dedup
        .decontaminate(noDocs, noDocs, "text", "doc_id")
        .count() === 0)
    // empty bench side: nothing is contaminated, corpus passes through
    val docs = Seq((60L, "some training text here")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(docs, noDocs, "text", "doc_id").count() === 1)
  }

  test("heavy hitters: empty stream has no hitters") {
    assert(
      HeavyHitters
        .exactHeavyHitters(noKV, "k", 1, 100, k = 256)
        .count() === 0)
    assert(HeavyHitters.approxTopK(noKV, "k").count() === 0)
  }

  test("joins and merge: empty sides behave as identities") {
    val data = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    // empty small side: bloom semi-join keeps nothing
    assert(
      BloomJoin
        .bloomPrunedSemiJoin(data, "k", noKV.select(col("k").as("sk")), "sk",
          expectedItems = 8)
        .count() === 0)
    // empty big side: nothing to keep
    assert(
      BloomJoin
        .bloomPrunedSemiJoin(noKV, "k", data.select(col("k").as("sk")), "sk",
          expectedItems = 8)
        .count() === 0)
    // empty change batch: merge returns the snapshot unchanged
    val empt = Seq.empty[(Long, Double, Long, Boolean)]
      .toDF("k", "v", "version", "deleted")
    val merged = Upsert
      .merge(data, empt, Seq("k"), "version", "deleted")
      .as[(Long, Double)]
      .collect()
      .toSet
    assert(merged === Set((1L, 2.0), (2L, 3.0)))
  }

  test("group filter on empty input is empty, not an error") {
    assert(
      GroupApply
        .filterGroups(noKV, Seq("k"))(sum(col("v")), _ > 0.0)
        .count() === 0)
  }

  test("all-null value column: aggregates null out, dedup treats null text as empty") {
    val nulls = Seq[(Long, Option[Double])]((1L, None), (1L, None), (2L, None))
      .toDF("k", "v")
    // sum/min/max of an all-null group are null (SQL semantics), count is 0
    val agg = nulls
      .groupBy("k")
      .agg(count(col("v")).as("n"), sum(col("v")).as("s"))
      .as[(Long, Long, Option[Double])]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(agg(1L) === ((0L, None)) && agg(2L) === ((0L, None)))
    // null text rows: the hitters guard drops null keys, exact dedup
    // normalizes null text like empty text — neither throws
    val nullDocs = Seq[(Long, String)]((1L, null), (2L, "x"), (3L, null))
      .toDF("doc_id", "text")
    assert(Dedup.exact(nullDocs, "text", "doc_id").count() >= 1)
    assert(
      HeavyHitters
        .exactHeavyHitters(
          Seq[Option[Long]](None, None, Some(7L)).toDF("k"),
          "k", 1, 2, k = 16)
        .count() <= 1)
  }
}
