package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks the latest right row at or before left time") {
    val left = Seq(
      (1L, 10L, 5L), // key 10, t=5  → state at t=3
      (2L, 10L, 3L), // exact tie    → state at t=3 (<= semantics)
      (3L, 10L, 2L), // before both  → no match
      (4L, 20L, 9L)  // other key    → state at t=1
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 3L, "a"),
      (10L, 7L, "b"),
      (20L, 1L, "c")).toDF("k", "t", "state")

    val out = AsOfJoin(
      left,
      right,
      key = "k",
      leftTime = col("t"),
      rightTime = col("t"),
      payload = Seq("state"),
      tieBreak = "state")
      .select("event_id", "state")
      .as[(Long, Option[String])]
      .collect()
      .toMap

    assert(out(1L) === Some("a"))
    assert(out(2L) === Some("a"))
    assert(out(3L) === None)
    assert(out(4L) === Some("c"))
  }

  test("ties at equal right time resolve to greatest tie-break value") {
    val left = Seq((1L, 10L, 5L)).toDF("event_id", "k", "t")
    val right = Seq((10L, 5L, "x"), (10L, 5L, "z"), (10L, 5L, "y"))
      .toDF("k", "t", "state")
    val out = AsOfJoin(left, right, "k", col("t"), col("t"),
      Seq("state"), "state")
      .select("state").as[String].head()
    assert(out === "z")
  }

  test("partition count does not change as-of results") {
    val ev = Tables.events(spark, TestSpark.sf)
    def run(p: Int) = SparkEntry
      .queries("q25_asof_join")(spark, TestSpark.sf)
      .as[(Long, Long, Option[Long], Option[Double])]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(run(1) === run(16))
    assert(ev.count() > 0)
  }
}
