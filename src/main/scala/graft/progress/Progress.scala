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
  * Rendering is a plain console line (progress_bars.py:57-121 console
  * flavor); Jupyter widgets have no analog here.
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

  /** Poll `counter` every `intervalMs` while `body` runs, rendering a
    * console progress line; returns body's result. Mirrors the 0.25 s
    * refresh target of the reference (progress_bars.py:13).
    */
  def withConsoleBar[T](
      counter: RowCounter,
      total: Long,
      intervalMs: Long = 250L)(body: => T): T = {
    @volatile var done = false
    val t = new Thread(() => {
      while (!done) {
        render(counter.value, total)
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
      t.join(intervalMs * 2)
      render(counter.value, total)
      System.err.println()
    }
  }

  private def render(done: Long, total: Long): Unit = {
    val width = 40
    val frac =
      if (total <= 0) 0.0 else math.min(1.0, done.toDouble / total)
    val filled = (frac * width).toInt
    val bar = "#" * filled + "-" * (width - filled)
    System.err.print(s"\r[$bar] $done/$total (${(frac * 100).toInt}%)")
  }

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

  def installListener(spark: SparkSession): TaskProgressListener = {
    val l = new TaskProgressListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
