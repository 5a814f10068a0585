package graft.progress

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{
  SparkListener,
  SparkListenerStageCompleted,
  SparkListenerStageSubmitted,
  SparkListenerTaskEnd
}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Live progress reporting (reference: progress_bars.py — per-worker
  * counters streamed over a Manager queue with ~4 Hz adaptive throttle;
  * accounting modes at core.py:504-520).
  *
  * Spark equivalents used here:
  *  - row-level progress: a [[LongAccumulator]] ticked inside the
  *    operator (attach via [[rowCounter]] + `tick`), polled by a
  *    throttled daemon thread — the analog of the reference's
  *    per-UDF-invocation counters;
  *  - task-level progress: a [[SparkListener]] counting finished tasks
  *    per stage — the analog of per-worker Success messages
  *    (core.py:299-322).
  *
  * Rendering is pluggable ([[Renderer]]): a console line by default
  * (progress_bars.py:57-121 console flavor) or a caller-supplied
  * callback — the hook a notebook kernel (Almond, Zeppelin) binds a
  * widget to, mirroring the reference's environment-picked
  * ProgressBarsNotebookLab (progress_bars.py:124-188).
  *
  * Worker-side cost is throttled the same way the reference throttles
  * its queue puts (progress_wrapper, progress_bars.py:190-230):
  * [[AdaptiveTicker]] batches ticks locally and flushes to the
  * accumulator at a rate-adapted iteration stride targeting ~4 Hz —
  * per-row accumulator contention from 32 executor threads costs more
  * than the progress information is worth.
  */
object Progress {

  final class RowCounter private[Progress] (val acc: LongAccumulator)
      extends Serializable {
    /** Call inside the UDF / mapPartitions body — cheap (JVM add). */
    def tick(n: Long = 1L): Unit = acc.add(n)
    def value: Long = acc.value
  }

  def rowCounter(spark: SparkSession, name: String): RowCounter =
    new RowCounter(spark.sparkContext.longAccumulator(s"graft.progress.$name"))

  /** Progress tap: ticks `perRow` units per row as rows stream through —
    * a narrow pass appended AFTER the operator's stage, so the operator's
    * own expressions stay inside whole-stage codegen. Used for the
    * reference's accounting modes that are per-cell rather than per-row
    * (applymap total = rows × cols, core.py:228-235).
    */
  def ticked(
      df: org.apache.spark.sql.DataFrame,
      counter: RowCounter,
      perRow: Long = 1L): org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      it.map { r => counter.tick(perRow); r }
    }(enc)
  }

  /** Worker-side adaptive tick throttle — the reference's
    * `ProgressState` / `progress_wrapper` protocol (progress_bars.py:
    * 37-41, 190-230) on Spark primitives: ticks accumulate in a plain
    * local counter and flush to the [[RowCounter]] accumulator only at
    * `nextFlush` iterations; after each flush the stride is re-derived
    * from the observed rate so flushes land ~`intervalNs` apart
    * (`max(rate · interval, 1)` — the reference's exact formula).
    * Create ONE per task/partition and call [[flush]] when the
    * partition ends (pending ticks would otherwise be lost).
    */
  final class AdaptiveTicker(
      counter: RowCounter,
      intervalNs: Long = 250L * 1000 * 1000) {
    private var iter = 0L
    private var pending = 0L
    private var nextFlush = 1L
    private var lastFlushIter = 0L
    private var lastFlushTime = 0L
    private[graft] var flushes = 0L

    def tick(n: Long = 1L): Unit = {
      iter += 1
      pending += n
      if (iter >= nextFlush) {
        val now = System.nanoTime()
        if (lastFlushTime != 0L) {
          val dt = now - lastFlushTime
          val di = iter - lastFlushIter
          nextFlush = iter + (
            if (dt > 0) math.max((di.toDouble / dt * intervalNs).toLong, 1L)
            else 1L)
        } else nextFlush = iter + 1
        lastFlushIter = iter
        lastFlushTime = now
        flush()
      }
    }

    /** Push pending ticks to the accumulator (idempotent). */
    def flush(): Unit = if (pending > 0) {
      counter.tick(pending)
      pending = 0
      flushes += 1
    }
  }

  /** [[ticked]] with the adaptive throttle: progress taps on hot paths
    * (millions of rows per task) flush the accumulator a few times a
    * second instead of per row.
    */
  def tickedAdaptive(
      df: org.apache.spark.sql.DataFrame,
      counter: RowCounter,
      perRow: Long = 1L): org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      val t = new AdaptiveTicker(counter)
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) t.flush()
          h
        }
        def next(): org.apache.spark.sql.Row = {
          t.tick(perRow)
          it.next()
        }
      }
    }(enc)
  }

  /** Expected totals per accounting mode (reference core.py:228-235:
    * apply = rows, applymap = rows × cols, group ops = number of groups).
    * Each costs one count job — the reference gets totals free from the
    * in-memory frame; a 100-TB scan does not, so totals are opt-in and
    * the bar can also run total-less (indeterminate).
    */
  object totals {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col

    def rows(df: DataFrame): Long = df.count()
    def cells(df: DataFrame, nCols: Int): Long = df.count() * nCols
    def groups(df: DataFrame, keys: Seq[String]): Long =
      df.select(keys.map(col): _*).distinct().count()
  }

  /** Frontend hook — the analog of the reference's environment-picked
    * bar flavor (console vs Jupyter widget, progress_bars.py:191-198).
    * The driver-side poller calls `update` ~4 Hz and `close` once at
    * the end; a notebook kernel binds a widget in a [[CallbackRenderer]].
    */
  trait Renderer {
    def update(done: Long, total: Long): Unit
    def close(done: Long, total: Long): Unit = update(done, total)
  }

  /** `\r`-refreshed console line (progress_bars.py:57-121). */
  object ConsoleRenderer extends Renderer {
    def update(done: Long, total: Long): Unit = {
      val width = 40
      val frac =
        if (total <= 0) 0.0 else math.min(1.0, done.toDouble / total)
      val filled = (frac * width).toInt
      val bar = "#" * filled + "-" * (width - filled)
      System.err.print(s"\r[$bar] $done/$total (${(frac * 100).toInt}%)")
    }
    override def close(done: Long, total: Long): Unit = {
      update(done, total)
      System.err.println()
    }
  }

  /** Adapter for widget frontends: `f(done, total)` on every refresh. */
  final class CallbackRenderer(f: (Long, Long) => Unit) extends Renderer {
    def update(done: Long, total: Long): Unit = f(done, total)
  }

  /** Notebook-flavor renderer — the analog of the reference's Jupyter
    * widget bar (progress_bars.py:124-177: IntProgress + "n / max" Label
    * in an HBox, percent description, bar_style="success" on
    * completion). A JVM kernel has no ipywidgets; the notebook contract
    * here is "hand the frontend an HTML fragment per refresh" — Almond /
    * Toree / Livy frontends pass their `display(html)` function in, and
    * each update replaces the previous fragment (same cell-output
    * semantics as a widget update). Markup mirrors the reference's
    * three visual elements: filled bar, percent, absolute count.
    */
  final class NotebookRenderer(display: String => Unit) extends Renderer {
    private def html(done: Long, total: Long, finished: Boolean): String = {
      val frac =
        if (total <= 0) 0.0 else math.min(1.0, done.toDouble / total)
      val pct = f"${frac * 100}%.2f%%"
      // green on success, blue in flight — the reference's
      // bar_style="success" transition (progress_bars.py:166-168)
      val color = if (finished || (total > 0 && done >= total)) "#4caf50" else "#2196f3"
      s"""<div style="display:flex;align-items:center;gap:8px;font-family:monospace">
         |  <div style="width:200px;height:14px;background:#eee;border-radius:3px">
         |    <div style="width:${(frac * 100).toInt}%;height:100%;background:$color;border-radius:3px"></div>
         |  </div>
         |  <span>$pct</span><span>$done / $total</span>
         |</div>""".stripMargin
    }
    @volatile private var last: String = ""
    /** Last emitted fragment — lets a pull-style frontend poll instead. */
    def lastHtml: String = last
    def update(done: Long, total: Long): Unit = {
      last = html(done, total, finished = false)
      display(last)
    }
    override def close(done: Long, total: Long): Unit = {
      last = html(done, total, finished = true)
      display(last)
    }
  }

  /** Poll `counter` every `intervalMs` while `body` runs, pushing to
    * `renderer`; returns body's result. Mirrors the 0.25 s refresh
    * target of the reference (progress_bars.py:13).
    */
  def withBar[T](
      counter: RowCounter,
      total: Long,
      renderer: Renderer,
      intervalMs: Long = 250L)(body: => T): T = {
    @volatile var done = false
    val t = new Thread(() => {
      while (!done) {
        renderer.update(counter.value, total)
        Thread.sleep(intervalMs)
      }
    })
    t.setDaemon(true)
    t.start()
    try {
      val r = body
      r
    } finally {
      done = true
      // unbounded join: the poller exits within one interval + one
      // update() call. A timeout here let close() run CONCURRENTLY with
      // a still-executing update() when the renderer callback was slow
      // (> 2×interval) — reentering a single-threaded user callback
      // from two threads; if the callback hangs forever, hanging here
      // is the honest behavior
      t.join()
      renderer.close(counter.value, total)
    }
  }

  def withConsoleBar[T](
      counter: RowCounter,
      total: Long,
      intervalMs: Long = 250L)(body: => T): T =
    withBar(counter, total, ConsoleRenderer, intervalMs)(body)

  /** Stage/task progress listener — per-worker accounting analog. */
  final class TaskProgressListener extends SparkListener {
    val tasksDone = new AtomicLong(0)
    val stagesDone = new AtomicLong(0)
    @volatile var activeStages: Int = 0

    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
      activeStages += 1

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      activeStages -= 1
      stagesDone.incrementAndGet()
    }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasksDone.incrementAndGet()
      ()
    }
  }

  /** Listener registration is session-wide: pair every install with
    * [[uninstallListener]] when the tracked query finishes, or a
    * notebook session accumulates one live listener per query — each
    * still invoked for every task event application-wide.
    */
  def installListener(spark: SparkSession): TaskProgressListener = {
    val l = new TaskProgressListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  def uninstallListener(
      spark: SparkSession,
      l: TaskProgressListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
