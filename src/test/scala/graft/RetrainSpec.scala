package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AtomicAppend, Similarity}

/** The drift→retrain POLICY (round 15, acting on the q229 metrics):
  * [[Similarity.sqAppendIndex]] evaluates each batch's clip fraction
  * against the frozen bounds inline (zero extra actions) and, past
  * `graft.sq.retrain.clipfrac` (default
  * [[Similarity.DefaultSqRetrainClipFrac]]), rebuilds the index from
  * its own committed view with FRESH bounds — codes and `_meta`
  * switch under one commit marker. Pins: a shifted append stream
  * triggers EXACTLY ONE rebuild and the quantizer measurably fits the
  * data again; in-distribution appends never trigger; the explicit
  * [[Similarity.sqMaybeRetrain]] helper agrees with the inline form.
  */
class RetrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private lazy val evens = emb.where(pmod(col("vec_id"), lit(2)) === 0)
  private lazy val odds = emb.where(pmod(col("vec_id"), lit(2)) === 1)

  /** 4x-scaled odd-half slices under fresh ids — the DriftSpec shift,
    * split so a STREAM of drifted batches can arrive.
    */
  private def shifted(mod4: Int) = odds
    .where(pmod(col("vec_id"), lit(4)) === mod4)
    .select(
      (col("vec_id") + 100000L * (mod4 + 1)).as("vec_id"),
      transform(col("embedding").cast("array<double>"), x => x * 4d)
        .as("embedding"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-retrain-$tag").toString

  private def driftRows(idx: String) = Similarity
    .sqDriftMetrics(spark, idx, sourceTag = "s")
    .collect()

  test("shifted append stream: exactly one retrain, fresh bounds fit, codes distinguish again") {
    val idx = s"${tmp("sq")}/idx"
    val frozen = s"${tmp("sq")}/frozen" // retrain-disabled twin
    for (p <- Seq(idx, frozen))
      Similarity.sqWriteIndex(evens, "embedding", "vec_id", p, sourceTag = "s")
    Similarity.sqAppendIndex(
      shifted(1), "embedding", "vec_id", frozen, sourceTag = "s",
      retrainClipFrac = Some(2d))
    Similarity.sqAppendIndex(
      shifted(3), "embedding", "vec_id", frozen, sourceTag = "s",
      retrainClipFrac = Some(2d))
    // armed index: the first drifted batch trips the inline trigger —
    // the view folds to ONE leg whose _meta rides inside the fold
    Similarity.sqAppendIndex(
      shifted(1), "embedding", "vec_id", idx, sourceTag = "s")
    assert(AtomicAppend.viewLegCount(spark, idx) === 1,
      "retrain did not fold the view")
    assert(
      AtomicAppend.latestSegFile(spark, idx, "_meta").isDefined,
      "retrained _meta must publish inside the fold")
    val afterFirst = driftRows(idx)
    assert(afterFirst.length === 1 && afterFirst.head.getInt(0) === 0)
    // fresh bounds are the view's own min/max: zero clipping
    assert(afterFirst.head.getDouble(3) === 0.0,
      "retrained bounds must cover the folded corpus")
    // second drifted batch of the SAME distribution: the new bounds
    // already fit it — NO second retrain (exactly one rebuild)
    Similarity.sqAppendIndex(
      shifted(3), "embedding", "vec_id", idx, sourceTag = "s")
    assert(AtomicAppend.viewLegCount(spark, idx) === 2,
      "second in-new-distribution batch must append, not retrain")
    val seg1 = driftRows(idx).find(_.getInt(0) > 0).get
    assert(seg1.getDouble(3) <= Similarity.DefaultSqRetrainClipFrac,
      s"post-retrain append clip_frac ${seg1.getDouble(3)}")
    // the quantizer FITS again: per-component distortion across the
    // whole retrained index sits far below the frozen twin's drifted
    // segments (saturated codes dequantize to the old bounds' edge)
    val retrainedErr = driftRows(idx).map(_.getDouble(2)).max
    val frozenShiftedErr = Similarity
      .sqDriftMetrics(spark, frozen, sourceTag = "s")
      .where(col("seg") > 0)
      .collect()
      .map(_.getDouble(2))
      .min
    assert(retrainedErr * 5 < frozenShiftedErr,
      s"retrained err $retrainedErr vs frozen-shifted err $frozenShiftedErr")
    // (the dequantized values candidate ranking runs on are 5x+ closer
    // to the true vectors — the probe-quality statement; the rescore
    // was exact in both shapes by construction)
  }

  test("in-distribution appends never trigger; untouched root _meta stays the truth") {
    val idx = s"${tmp("indist")}/idx"
    Similarity.sqWriteIndex(evens, "embedding", "vec_id", idx, sourceTag = "s")
    Similarity.sqAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    assert(AtomicAppend.viewLegCount(spark, idx) === 2,
      "in-distribution append must not fold")
    assert(AtomicAppend.latestSegFile(spark, idx, "_meta").isEmpty,
      "no retrain → no in-segment _meta")
    // the explicit out-of-band helper agrees: nothing to do
    assert(!Similarity.sqMaybeRetrain(spark, idx, sourceTag = "s"))
    assert(AtomicAppend.viewLegCount(spark, idx) === 2)
  }

  test("explicit sqMaybeRetrain: no-op on base-only, retrains a drifted segment") {
    val idx = s"${tmp("explicit")}/idx"
    Similarity.sqWriteIndex(evens, "embedding", "vec_id", idx, sourceTag = "s")
    assert(!Similarity.sqMaybeRetrain(spark, idx, sourceTag = "s"))
    // land a drifted segment with the inline trigger disabled (an
    // operator pausing auto-retrain, alerting on q229 out-of-band)
    Similarity.sqAppendIndex(
      shifted(1), "embedding", "vec_id", idx, sourceTag = "s",
      retrainClipFrac = Some(2d))
    assert(AtomicAppend.viewLegCount(spark, idx) === 2)
    assert(Similarity.sqMaybeRetrain(spark, idx, sourceTag = "s"))
    assert(AtomicAppend.viewLegCount(spark, idx) === 1)
    assert(driftRows(idx).head.getDouble(3) === 0.0)
    // second call: the fold is the new base — nothing to retrain
    assert(!Similarity.sqMaybeRetrain(spark, idx, sourceTag = "s"))
  }

  test("IVF occupancy retrain decision: pile trips, in-distribution does not") {
    val idx = tmp("ivf")
    Similarity.ivfWriteIndexKmeans(
      evens.drop("label"), "embedding", "vec_id", idx, k = 4, iters = 3,
      sourceTag = "s")
    Similarity.ivfAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    assert(Similarity.occupancyRetrainNeeded(spark, idx).isEmpty,
      "in-distribution occupancy must not demand a retrain")
    val v = evens
      .where(col("vec_id") === 2)
      .select(col("embedding").cast("array<double>"))
      .head()
      .getSeq[Double](0)
    val pile = (0 until 40).map(i => (200000L + i, v)).toDF("vec_id", "embedding")
    Similarity.ivfAppendIndex(pile, "embedding", "vec_id", idx, sourceTag = "s")
    val tripped = Similarity.occupancyRetrainNeeded(spark, idx)
    assert(tripped.nonEmpty, "single-cell pile must demand a retrain")
    assert(tripped.forall(_.getAs[Int]("seg") > 0))
  }

  /** 40 copies of one even vector under fresh ids — the occupancy
    * pile that breaks nprobe's scan bound on a frozen quantizer.
    */
  private def pileOf(vecId: Long, n: Int = 40) = {
    val v = evens
      .where(col("vec_id") === vecId)
      .select(col("embedding").cast("array<double>"))
      .head()
      .getSeq[Double](0)
    (v, (0 until n).map(i => (200000L + i, v)).toDF("vec_id", "embedding"))
  }

  test("IVF occupancy retrain: pile triggers exactly one rebuild with build-recorded params; probe finds the pile at nprobe=1") {
    val idx = tmp("ivfr")
    Similarity.ivfWriteIndexKmeans(
      evens.drop("label"), "embedding", "vec_id", idx, k = 4, iters = 3,
      sourceTag = "s")
    Similarity.ivfAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    // in-distribution append: decision says no, nothing folds
    assert(!Similarity.ivfMaybeRetrain(spark, idx))
    assert(AtomicAppend.viewLegCount(spark, s"$idx/corpus") === 2)
    val (v, pile) = pileOf(2L)
    Similarity.ivfAppendIndex(pile, "embedding", "vec_id", idx, sourceTag = "s")
    // k and iters come from the build-time _meta — no parameters here
    assert(Similarity.ivfMaybeRetrain(spark, idx),
      "single-cell pile must trigger the rebuild")
    assert(AtomicAppend.viewLegCount(spark, s"$idx/corpus") === 1,
      "retrain must fold the view")
    assert(
      AtomicAppend.latestSegFile(spark, s"$idx/corpus", "_centroids").isDefined,
      "retrained centroids must publish inside the fold")
    // exactly one rebuild: the fold is the new base, nothing trips
    assert(!Similarity.ivfMaybeRetrain(spark, idx))
    // the re-trained quantizer gives the 40-copy pile its own cell:
    // probing the pile vector at nprobe=1 recalls pile members with
    // exact cosine 1 — the scan-bound/recall statement
    val got = Similarity
      .ivfProbeIndex(spark, idx, v, k = 10, nprobe = 1, sourceTag = "s")
      .collect()
    assert(got.length === 10)
    assert(got.forall(_.getDouble(1) > 0.999999),
      "nprobe=1 probe must land in the pile's own cell post-retrain")
    // appends AFTER the retrain assign against the RETRAINED centroids
    // (the resolver, not the stale root table): an in-distribution
    // batch spreads like the new base and never re-triggers
    val extra = evens
      .where(pmod(col("vec_id"), lit(5)) === 0)
      .select((col("vec_id") + 300000L).as("vec_id"), col("embedding"))
    Similarity.ivfAppendIndex(extra, "embedding", "vec_id", idx, sourceTag = "s")
    assert(!Similarity.ivfMaybeRetrain(spark, idx),
      "an in-distribution append under the retrained quantizer must not re-trigger")
  }

  test("label-built IVF index refuses a parameterless retrain, accepts explicit k") {
    val idx = tmp("ivflab")
    val labeled = evens.withColumn("cl", pmod(col("vec_id"), lit(3)))
    Similarity.ivfWriteIndex(labeled, "embedding", "vec_id", "cl", idx,
      sourceTag = "s")
    Similarity.ivfAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    intercept[IllegalArgumentException](Similarity.ivfRetrain(spark, idx))
    Similarity.ivfRetrain(spark, idx, k = Some(3))
    assert(AtomicAppend.viewLegCount(spark, s"$idx/corpus") === 1)
    assert(
      AtomicAppend.latestSegFile(spark, s"$idx/corpus", "_centroids").isDefined)
  }

  test("IVF-PQ occupancy retrain: one fold re-trains centroids AND codebooks, re-encodes, probe recalls the pile") {
    val idx = tmp("ivfpqr")
    graft.operators.ProductQuant.ivfPqWriteIndex(
      evens.drop("label"), "embedding", "vec_id", idx,
      kClusters = 4, m = 8, ksub = 16, iters = 3, sourceTag = "s")
    graft.operators.ProductQuant.ivfPqAppendIndex(
      odds, "embedding", "vec_id", idx, sourceTag = "s")
    assert(!graft.operators.ProductQuant.ivfPqMaybeRetrain(spark, idx))
    assert(AtomicAppend.viewLegCount(spark, s"$idx/corpus") === 2)
    val (v, pile) = pileOf(2L)
    graft.operators.ProductQuant.ivfPqAppendIndex(
      pile, "embedding", "vec_id", idx, sourceTag = "s")
    assert(graft.operators.ProductQuant.ivfPqMaybeRetrain(spark, idx),
      "single-cell pile must trigger the rebuild")
    assert(AtomicAppend.viewLegCount(spark, s"$idx/corpus") === 1)
    assert(
      AtomicAppend.latestSegFile(spark, s"$idx/corpus", "_centroids").isDefined)
    assert(
      AtomicAppend.latestSegFile(spark, s"$idx/corpus", "_codebooks").isDefined)
    assert(!graft.operators.ProductQuant.ivfPqMaybeRetrain(spark, idx))
    // probe post-retrain: ADC scan + exact re-rank find the pile at
    // nprobe=1 with exact cosine 1 (the re-encode used the NEW
    // codebooks or ADC ranking would collapse)
    val got = graft.operators.ProductQuant
      .ivfPqProbe(spark, idx, v, k = 10, nprobe = 1, refine = 20,
        sourceTag = "s")
      .collect()
    assert(got.length === 10)
    assert(got.forall(_.getDouble(1) > 0.999999))
    // append after retrain: frozen against the NEW quantizer state;
    // an in-distribution batch spreads like the new base
    val extra = evens
      .where(pmod(col("vec_id"), lit(5)) === 0)
      .select((col("vec_id") + 300000L).as("vec_id"), col("embedding"))
    graft.operators.ProductQuant.ivfPqAppendIndex(
      extra, "embedding", "vec_id", idx, sourceTag = "s")
    assert(!graft.operators.ProductQuant.ivfPqMaybeRetrain(spark, idx))
  }
}
