package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.HeavyHitters

/** Streaming heavy hitters: a Misra–Gries summary as PER-KEY streaming
  * state ([[HeavyHitters]] is the batch twin; both share the same
  * insert/merge core, so the streaming state after any batch split
  * obeys the same est ≤ true ≤ est + N/(k+1) guarantee — MG insertion
  * is a left fold, and folding a stream in batches IS the same fold).
  *
  * State is hard-bounded at k counters per key — the property that
  * lets this run forever: a vocabulary-sized exact counter map would
  * grow without limit on an open stream. `mapGroupsWithState` keys the
  * state store by `key`, hash-partitioned like any agg — scales out by
  * key cardinality across executors.
  *
  * Emits the current top-`topN` (value, est) per key every batch
  * (Update mode semantics).
  */
object StreamTopK {

  case class TokenEvent(key: String, token: String)
  case class TopKState(counters: Map[String, Long], n: Long)
  case class TopKOut(
      key: String,
      n_total: Long,
      top: Seq[String],
      est: Seq[Long])

  def topKStream(
      events: Dataset[TokenEvent],
      k: Int = 64,
      topN: Int = 10): Dataset[TopKOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[TopKState, TopKOut](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[TokenEvent], state: GroupState[TopKState]) =>
          val prior =
            state.getOption.getOrElse(TopKState(Map.empty, 0L))
          var m = prior.counters
          var n = prior.n
          rows.foreach { e =>
            // null tokens are uncountable in the batch twin too
            // (count(valueCol) skips them) — n must track what insert
            // tracks or the N/(k+1) bound bookkeeping inflates
            if (e.token != null) {
              m = HeavyHitters.insert(m, e.token, k)
              n += 1
            }
          }
          state.update(TopKState(m, n))
          val top = m.toSeq.sortBy { case (t, c) => (-c, t) }.take(topN)
          TopKOut(key, n, top.map(_._1), top.map(_._2))
      }
  }
}
