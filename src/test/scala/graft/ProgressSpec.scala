package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.progress.Progress

/** Progress accounting (reference progress_bars.py): row counters ticked
  * inside distributed operators reach the driver; the task listener
  * counts completed work.
  */
class ProgressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("row counter ticks once per processed row across partitions") {
    val counter = Progress.rowCounter(spark, "test-rows")
    val n = Tables.lineitem(spark, TestSpark.sf).count()
    val ds = Tables
      .lineitem(spark, TestSpark.sf)
      .repartition(8)
      .select("l_quantity")
      .as[Double]
      .map { x => counter.tick(); x * 2 }
    ds.write.format("noop").mode("overwrite").save()
    assert(counter.value === n)
  }

  test("task listener observes completed stages and tasks") {
    val l = Progress.installListener(spark)
    Tables.lineitem(spark, TestSpark.sf).repartition(4).count()
    // listener events are delivered asynchronously — poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (l.tasksDone.get() < 4 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(l.tasksDone.get() >= 4)
    assert(l.stagesDone.get() >= 1)
  }

  test("console bar wraps a body and returns its result") {
    val counter = Progress.rowCounter(spark, "test-bar")
    val r = Progress.withConsoleBar(counter, total = 10, intervalMs = 20) {
      counter.acc.add(10); 42
    }
    assert(r === 42)
  }
}
