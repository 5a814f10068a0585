package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.Sketches
import graft.operators.Sketches.CMSketch

/** Streaming point-frequency estimates: a Count-Min sketch as PER-KEY
  * streaming state — completing the streaming sketch family next to
  * [[StreamDistinct]] (HLL, "how many distinct") and [[StreamTopK]]
  * (Misra–Gries, "which are heaviest"): "how often has THIS value
  * occurred under this key, ever" on an unbounded stream, in a fixed
  * width·depth·8-byte matrix per key.
  *
  * The insert is [[graft.operators.Sketches.cmsInsert]] — the SAME
  * function the batch Aggregator reduces with, so the two surfaces
  * share one hash family and the streamed state after any batch split
  * is BIT-IDENTICAL to the batch sketch of the same rows (CMS inserts
  * are plain cell additions — commutative and associative; stronger
  * than StreamDistinct's error-envelope agreement, asserted exactly in
  * StreamingSpec). Estimates inherit the batch guarantees: never
  * undercount, overcount ≤ e/width · n w.h.p.
  *
  * Parameter drift (restarting with a different width/depth) is an
  * ERROR, never silent — mixing geometries per key would quietly break
  * the error bound (the StreamDistinct lgK contract).
  *
  * State store is keyed and hash-partitioned — scales out by key
  * cardinality. Emits current estimates for the declared `probes`
  * every batch (Update mode semantics).
  */
object StreamCms {

  case class KeyedValue(key: String, value: String)
  case class CmsOut(key: String, value: String, est: Long, n: Long)

  def cmsStream(
      events: Dataset[KeyedValue],
      probes: Seq[String],
      width: Int = 2048,
      depth: Int = 5): Dataset[CmsOut] = {
    require(probes.nonEmpty, "need at least one probe value")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[CMSketch, CmsOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue],
         state: GroupState[CMSketch]) =>
          val sk = state.getOption
            .map { s =>
              require(
                s.width == width && s.depth == depth,
                s"stream-cms state for key '$key' was built ${s.width}x" +
                  s"${s.depth}; refusing ${width}x$depth — restart with " +
                  "the original geometry or a fresh checkpoint")
              s
            }
            .getOrElse(CMSketch(width, depth, 0L, new Array[Long](width * depth)))
          val updated = rows.foldLeft(sk)((b, e) => Sketches.cmsInsert(b, e.value))
          state.update(updated)
          probes.iterator.map(p =>
            CmsOut(key, p, Sketches.cmsPointEstimate(updated, p), updated.n))
      }
  }
}
