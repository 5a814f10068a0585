package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ProductQuant, Similarity}

/** Drift metrics for the frozen-quantizer index families (round-14,
  * the r13 verdict's #5): every append path freezes its quantizer by
  * design (SQ bounds, IVF centroids, IVF-PQ codebooks) and documents
  * "drift eventually wants a retrain = rebuild" — these tests pin
  * that the METRIC actually carries that signal: a deliberately
  * shifted append batch moves it, an in-distribution one doesn't.
  * The SQ metric is also the hash-green q229 (DuckDB replays the
  * bounds/clamp/dequantize arithmetic); the occupancy metric rides
  * trained centroids so it is pinned here instead.
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private lazy val evens = emb.where(pmod(col("vec_id"), lit(2)) === 0)
  private lazy val odds = emb.where(pmod(col("vec_id"), lit(2)) === 1)

  /** The odd half, scaled far outside the frozen even-half bounds. */
  private def shiftedOdds = odds.select(
    col("vec_id"),
    transform(col("embedding").cast("array<double>"), x => x * 4d)
      .as("embedding"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-drift-$tag").toString

  test("SQ drift: in-distribution append stays near base; shifted append moves both metrics") {
    val inIdx = s"${tmp("sq")}/in"
    Similarity.sqWriteIndex(evens, "embedding", "vec_id", inIdx, sourceTag = "s")
    Similarity.sqAppendIndex(odds, "embedding", "vec_id", inIdx, sourceTag = "s")
    val inRows = Similarity
      .sqDriftMetrics(spark, inIdx, sourceTag = "s")
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(inRows.keySet === Set(0, 1))
    val (n0, err0, clip0) = inRows(0)
    val (n1, err1, clip1) = inRows(1)
    assert(n0 > 0 && n1 > 0)
    // base segment: bounds ARE its min/max — zero clipping by
    // construction, and the distortion is the irreducible half-step
    assert(clip0 === 0.0)
    // in-distribution append: a handful of components may exceed the
    // frozen bounds slightly, but the batch is the same distribution —
    // drift must NOT fire
    assert(clip1 < 0.05, s"in-distribution clip_frac $clip1")
    assert(err1 < 2 * err0, s"in-distribution err $err1 vs base $err0")

    val shIdx = s"${tmp("sq")}/sh"
    Similarity.sqWriteIndex(evens, "embedding", "vec_id", shIdx, sourceTag = "s")
    // this spec OBSERVES drift on the frozen quantizer — the auto
    // retrain (which would correctly fire on this batch and fold the
    // segment away) is disabled for the shifted append via the
    // explicit per-call threshold (not a process-global sys.prop,
    // which would race concurrent appends); RetrainSpec owns the
    // trigger behavior
    Similarity.sqAppendIndex(shiftedOdds, "embedding", "vec_id", shIdx,
      sourceTag = "s", retrainClipFrac = Some(2d))
    val sh = Similarity
      .sqDriftMetrics(spark, shIdx, sourceTag = "s")
      .where(col("seg") === 1)
      .head()
    val (errSh, clipSh) = (sh.getDouble(2), sh.getDouble(3))
    // 4x-scaled vectors: most components land outside the frozen
    // bounds and the saturated codes dequantize far from the values
    assert(clipSh > 0.2, s"shifted clip_frac $clipSh")
    assert(errSh > 5 * err0, s"shifted err $errSh vs base $err0")
    assert(clipSh > 10 * math.max(clip1, 1e-9))
  }

  /** One vector piled under fresh ids — every row lands in a single
    * frozen cell, the worst-case occupancy drift.
    */
  private def pile(n: Int) = {
    val v = evens
      .where(col("vec_id") === 2)
      .select(col("embedding").cast("array<double>"))
      .head()
      .getSeq[Double](0)
    (0 until n).map(i => (100000L + i, v)).toDF("vec_id", "embedding")
  }

  test("IVF occupancy drift: in-distribution append small TV; single-cell pile large TV") {
    val idx = tmp("ivf")
    Similarity.ivfWriteIndexKmeans(
      evens.drop("label"), "embedding", "vec_id", idx, k = 4, iters = 3,
      sourceTag = "s")
    Similarity.ivfAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    Similarity.ivfAppendIndex(pile(40), "embedding", "vec_id", idx,
      sourceTag = "s")
    val rows = Similarity
      .clusterOccupancyDrift(spark, idx)
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(rows.keySet === Set(0, 1, 2))
    assert(rows(0)._1 === 0.0) // base vs itself
    val (tvIn, _) = rows(1)
    val (tvPile, sharePile) = rows(2)
    assert(tvIn < 0.35, s"in-distribution TV $tvIn")
    assert(tvPile > 0.4, s"pile TV $tvPile")
    assert(tvPile > 2 * math.max(tvIn, 1e-9))
    assert(sharePile === 1.0) // every pile row in one cell
  }

  test("drift after compaction: the fold is the new base, totals conserved") {
    import graft.operators.AtomicAppend
    val idx = s"${tmp("sqc")}/idx"
    Similarity.sqWriteIndex(evens, "embedding", "vec_id", idx, sourceTag = "s")
    Similarity.sqAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    val pre = Similarity
      .sqDriftMetrics(spark, idx, sourceTag = "s")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val preN = pre.map(_._1).sum
    AtomicAppend.compact(spark, idx)((d, p) =>
      d.write.mode("overwrite").parquet(p))
    val post = Similarity.sqDriftMetrics(spark, idx, sourceTag = "s").collect()
    // one provenance bucket left: the fold IS the base (seg 0)
    assert(post.length === 1 && post.head.getInt(0) === 0)
    assert(post.head.getLong(1) === preN, "fold lost or duplicated rows")
    // the frozen bounds are untouched, so the folded clip fraction is
    // the row-weighted mix of the pre-fold segments'
    val mixed = pre.map { case (n, cf) => n * cf }.sum / preN
    assert(math.abs(post.head.getDouble(3) - mixed) < 1e-6)
  }

  test("IVF-PQ occupancy drift: same signal through the PQ corpus layout") {
    val idx = tmp("ivfpq")
    ProductQuant.ivfPqWriteIndex(
      evens.drop("label"), "embedding", "vec_id", idx,
      kClusters = 4, m = 8, ksub = 16, iters = 2, sourceTag = "s")
    ProductQuant.ivfPqAppendIndex(odds, "embedding", "vec_id", idx, "s")
    ProductQuant.ivfPqAppendIndex(pile(40), "embedding", "vec_id", idx, "s")
    val rows = Similarity
      .clusterOccupancyDrift(spark, idx)
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(rows.keySet === Set(0, 1, 2))
    assert(rows(0)._1 === 0.0)
    assert(rows(1)._1 < 0.35, s"in-distribution TV ${rows(1)._1}")
    assert(rows(2)._1 > 0.4 && rows(2)._1 > 2 * math.max(rows(1)._1, 1e-9))
    assert(rows(2)._2 === 1.0)
  }
}
