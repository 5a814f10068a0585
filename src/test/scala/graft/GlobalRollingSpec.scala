package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Windows

/** The scalable total-order rolling window must equal the
  * single-partition WindowExec result exactly — including warm-up nulls
  * and boundary rows between range partitions.
  */
class GlobalRollingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scalable global rolling equals single-partition window result") {
    // local function VALUE — a method reference would capture the spec
    // instance in the task closure (not serializable)
    val poly: Seq[Double] => Double = xs =>
      xs(0) + math.pow(xs(1), 2) + math.pow(xs(2), 3) + math.pow(xs(3), 4)
    val ev = Tables.events(spark, TestSpark.sf)
    val reference = Windows
      .rollingCollect(ev, col("value"), Seq(col("event_id")), Nil, 4, "v")(poly)
      .select("event_id", "v")
      .as[(Long, Option[Double])]
      .collect()
      .toMap

    val scalable = Windows
      .rollingGlobalScalable(ev, "event_id", "value", 4, "v",
        numPartitions = 7)(poly)
      .as[(Long, Option[Double])]
      .collect()
      .toMap

    assert(scalable.size === reference.size)
    reference.foreach { case (k, exp) =>
      (exp, scalable(k)) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-9, s"event $k: $a vs $b")
        case (None, None) => ()
        case other => fail(s"event $k: $other")
      }
    }
  }

  test("partitions smaller than the window still chain carries correctly") {
    // 10 rows over 8 partitions → most partitions have 1-2 rows < w-1
    val tiny = (1L to 10L).map(i => (i, i.toDouble)).toDF("t", "value")
    val got = Windows
      .rollingGlobalScalable(tiny, "t", "value", 4, "v", numPartitions = 8)(
        _.sum)
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    assert(got(3L) === None) // warm-up
    assert(got(4L) === Some(1.0 + 2 + 3 + 4))
    assert(got(10L) === Some(7.0 + 8 + 9 + 10))
  }
}
