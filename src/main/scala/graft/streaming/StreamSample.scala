package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.operators.Sampling

/** Streaming per-group weighted k-sample WITHOUT replacement — the
  * streaming twin of [[graft.operators.Sampling.weightedSamplePerGroup]]
  * (Efraimidis–Spirakis IPL 2006), completing the streaming roster's
  * sampling slot beside the sketches (HLL distinct, MG top-k, CMS
  * frequencies).
  *
  * The sampling key is the SAME content-hash expression the batch
  * sampler computes ([[Sampling.esKey]]: −ln(u)/w, u a 52-bit
  * md5-content uniform), so keeping the k smallest keys per group is
  * an associative, commutative, duplicate-preserving fold — the
  * streamed state after ANY batch split is EXACTLY the batch sampler's
  * answer over the same rows (asserted to equality in StreamingSpec,
  * the StreamCms bit-identity stance, stronger than a distributional
  * bound). New rows never displace a kept row unless their key is
  * strictly better. Replay safety comes from the STATE STORE's
  * per-batch versioning (a reprocessed batch folds into the
  * pre-batch snapshot, not the post-batch one) — NOT from merge
  * idempotence: the min-k merge is duplicate-preserving by design
  * (a true duplicate row is a second sample unit), so re-inserting a
  * row already in state would add a second (esk, content) entry and
  * could evict the legitimate k-th item. A foreachBatch port of this
  * fold would need its own replay story (e.g. a batch-id high-water
  * mark) before re-merging delivered batches.
  *
  * State is hard-bounded at k (key, content, weight) triples per
  * group — an open stream can run forever; the state store partitions
  * by group like any agg. Ties on the key break on content (the
  * deterministic tieBreak the batch twin is called with), so the
  * sample is a pure function of the observed multiset.
  */
object StreamSample {

  case class Item(group: String, content: String, weight: Double)
  /** Internal row shape of the keyed stream (public: Catalyst's
    * generated encoders cannot access private classes).
    */
  case class KeyedItem(
      group: String,
      content: String,
      weight: Double,
      esk: Double)
  case class SampleState(items: Seq[(Double, String, Double)])
  case class SampleOut(
      group: String,
      content: Seq[String],
      weight: Seq[Double])

  /** Emits each group's CURRENT k-sample every batch (Update mode). */
  def sampleStream(
      items: Dataset[Item],
      k: Int,
      seed: String = ""): Dataset[SampleOut] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val keyed = items
      .toDF()
      .where(col("weight") > 0)
      .withColumn("esk", Sampling.esKey(col("content"), col("weight"), seed))
      .as[KeyedItem]
    keyed
      .groupByKey(_.group)
      .mapGroupsWithState[SampleState, SampleOut](GroupStateTimeout.NoTimeout) {
        (g, rows, state) =>
          val prior = state.getOption.map(_.items).getOrElse(Seq.empty)
          val merged = (prior ++ rows.map(r => (r.esk, r.content, r.weight)))
            .sortBy(t => (t._1, t._2))
            .take(k)
          state.update(SampleState(merged))
          SampleOut(g, merged.map(_._2), merged.map(_._3))
      }
  }
}
