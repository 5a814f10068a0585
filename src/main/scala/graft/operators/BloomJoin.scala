package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi-join — the runtime-filter pattern for joins
  * whose build side is too large to broadcast as a hash relation but
  * whose KEY SET compresses into a few-MB bloom sketch.
  *
  * At 100 TB the expensive part of `big SEMI JOIN small` is shuffling
  * the probe side: every big-side row travels to its hash partition
  * before the join can drop it. A bloom filter over the small side's
  * keys (n keys at fpp=1% ≈ 1.2 bytes/key — a 100M-key dimension is a
  * ~120 MB sketch, vs gigabytes as a broadcast hash relation) prunes
  * (1 − selectivity − fpp) of the probe side BEFORE the exchange, so
  * the shuffle moves only plausible matches. The residual equi-semi-join
  * then removes the false positives, so the result is EXACTLY the
  * semi-join — bloom quality affects cost, never correctness. This is
  * the same design as Spark's own row-level runtime filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, injected by
  * `InjectRuntimeFilter`); here it is explicit so the sketch can be
  * built once and reused across queries.
  *
  * The sketch is built with `DataFrameStatFunctions.bloomFilter` (a
  * distributed aggregation; only the fixed-size bitmap reaches the
  * driver) and shipped as a broadcast variable.
  */
object BloomJoin {

  /** Exact semi-join of `big` against `small`'s keys, bloom-pruned
    * before the exchange. Long-typed keys (the common surrogate-key
    * case; `mightContainLong` avoids boxing in the per-row probe).
    */
  def bloomPrunedSemiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // materialize the build side's KEYS once: three consumers follow
    // (emptiness check, bloom aggregation, the exact semi-join), and
    // without this an expensive computed `small` plan executes three
    // full times per call
    val keys = small
      .select(col(smallKey).as(bigKey))
      .transform(graft.ops.Stage.materializeOnce)
    // stat.bloomFilter NPEs on a zero-row build side (the sketch
    // aggregate returns null bytes); an empty key set means an empty
    // filter — the quiet-period batch must not crash the join
    val bf =
      if (keys.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else keys.stat.bloomFilter(bigKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    // the UDF is only a PRUNE (cheap, stage-local, no exchange); rows it
    // keeps still pass through the exact semi-join below, so a udf here
    // costs two hash probes per row and buys skipping the shuffle for
    // every pruned row — the trade Spark's InjectRuntimeFilter makes
    val might = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big
      .where(might(col(bigKey)))
      .join(keys, Seq(bigKey), "leftsemi")
  }
}
