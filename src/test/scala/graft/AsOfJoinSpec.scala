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

  test("forward direction picks the next right row at or after left time") {
    val left = Seq(
      (1L, 10L, 5L), // → next right at t=7
      (2L, 10L, 7L), // exact tie → t=7 (allow_exact_matches)
      (3L, 10L, 8L), // after both rights → no match
      (4L, 20L, 0L)  // other key → t=1
    ).toDF("event_id", "k", "t")
    val right = Seq((10L, 3L, "a"), (10L, 7L, "b"), (20L, 1L, "c"))
      .toDF("k", "t", "state")
    val out = AsOfJoin(left, right, "k", col("t"), col("t"),
      Seq("state"), "state", direction = "forward")
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L) === Some("b"))
    assert(out(2L) === Some("b"))
    assert(out(3L) === None)
    assert(out(4L) === Some("c"))
  }

  test("nearest direction picks the closer side, backward wins exact ties") {
    val left = Seq(
      (1L, 10L, 4L), // dist 1 back (t=3) vs 3 fwd (t=7) → "a"
      (2L, 10L, 6L), // dist 3 back vs 1 fwd → "b"
      (3L, 10L, 5L), // equidistant → backward wins → "a"
      (4L, 10L, 9L)  // only backward exists → "b"
    ).toDF("event_id", "k", "t")
    val right = Seq((10L, 3L, "a"), (10L, 7L, "b")).toDF("k", "t", "state")
    val out = AsOfJoin(left, right, "k", col("t"), col("t"),
      Seq("state"), "state", direction = "nearest")
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L) === Some("a"))
    assert(out(2L) === Some("b"))
    assert(out(3L) === Some("a"))
    assert(out(4L) === Some("b"))
  }

  test("tolerance nulls the payload but keeps the row") {
    val left = Seq((1L, 10L, 5L), (2L, 10L, 50L)).toDF("event_id", "k", "t")
    val right = Seq((10L, 3L, "a")).toDF("k", "t", "state")
    val out = AsOfJoin(left, right, "k", col("t"), col("t"),
      Seq("state"), "state", tolerance = Some(10L))
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L) === Some("a")) // dist 2 <= 10
    assert(out(2L) === None) // dist 47 > 10: row kept, payload nulled
    assert(out.size === 2)
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
