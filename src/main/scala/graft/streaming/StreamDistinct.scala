package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming approximate distinct count: a Datasketches HLL sketch as
  * PER-KEY streaming state — the streaming twin of
  * [[graft.operators.Sketches]] (same library the built-in
  * `hll_sketch_agg` uses, same lgK sizing). "Distinct users per key
  * over an unbounded stream" with an exact counter means storing every
  * id ever seen per key — state that grows without limit; the sketch
  * is a fixed ~2^lgK-byte register array per key, and HLL register
  * updates are max() folds, so they are order- and batching-
  * insensitive: the streaming state after ANY batch split equals the
  * same fold in one batch (StreamingSpec asserts this exactly). The
  * DISTRIBUTED batch twin ([[graft.operators.Sketches.hllDistinct]],
  * a partial+final sketch UNION) agrees within the HLL error bound
  * but not bit-exactly — union re-encoding can shift the estimate a
  * few counts at the margin.
  *
  * State store is keyed and hash-partitioned like any agg — scales out
  * by key cardinality. Emits the current estimate per key every batch
  * (Update mode semantics).
  */
object StreamDistinct {

  case class KeyedValue(key: String, value: String)
  case class DistinctOut(key: String, n_distinct_approx: Double)

  def distinctStream(
      events: Dataset[KeyedValue],
      lgK: Int = 12): Dataset[DistinctOut] = {
    import events.sparkSession.implicits._
    import org.apache.datasketches.hll.HllSketch
    import org.apache.datasketches.memory.Memory
    events
      .groupByKey(_.key)
      .mapGroupsWithState[Array[Byte], DistinctOut](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue],
         state: GroupState[Array[Byte]]) =>
          val sketch = state.getOption
            .map { b =>
              val s = HllSketch.heapify(Memory.wrap(b))
              // parameter drift is an ERROR, never silent (the
              // minHashEnsureMeta contract): restarting the stream
              // with a different lgK would mix sketch precisions per
              // key and quietly break the error-bound guarantee
              require(
                s.getLgConfigK == lgK,
                s"stream-distinct state for key '$key' was built with " +
                  s"lgK=${s.getLgConfigK}; refusing lgK=$lgK — restart " +
                  "with the original precision or a fresh checkpoint")
              s
            }
            .getOrElse(
              // HLL_8, not the library default HLL_4: the batch twin
              // (Spark's hll_sketch_agg) builds HLL_8 sketches, and the
              // streamed-equals-batch differential needs identical
              // register encoding
              new HllSketch(
                lgK, org.apache.datasketches.hll.TgtHllType.HLL_8))
          rows.foreach { e =>
            // null values are uncountable in the batch twin too
            // (hll_sketch_agg skips them). Update with UTF-8 BYTES:
            // datasketches' update(String) hashes the char array, but
            // Spark's hll_sketch_agg hashes the UTF8String bytes — the
            // differential "streamed == batch estimate" only holds if
            // both sides feed the hash identical input
            if (e.value != null)
              sketch.update(
                e.value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          state.update(sketch.toUpdatableByteArray)
          DistinctOut(key, sketch.getEstimate)
      }
  }
}
