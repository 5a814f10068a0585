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
