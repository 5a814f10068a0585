package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** Misra–Gries guarantees, checked against exact counts on planted
  * skew: heavy items always present, estimates undercount by at most
  * N/(k+1), and the bound survives any partitioning (mergeability).
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 500×hot1, 300×hot2, 40×warm, 400 distinct singletons → N = 1240
  private def planted = {
    val rows =
      Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
        Seq.fill(40)("warm") ++ (0 until 400).map(i => s"cold$i")
    rows.toDF("token")
  }

  private def estimates(k: Int, parts: Int): Map[String, Long] =
    HeavyHitters
      .approxTopK(planted.repartition(parts), "token", k = k, topN = 10)
      .select("value", "est")
      .as[(String, Long)]
      .collect()
      .toMap

  test("heavy items survive with est in [true - N/(k+1), true]") {
    val n = 1240.0
    val k = 64
    for (parts <- Seq(1, 7)) {
      val est = estimates(k, parts)
      val truth = Map("hot1" -> 500L, "hot2" -> 300L, "warm" -> 40L)
      truth.foreach { case (t, c) =>
        if (c > n / (k + 1)) {
          assert(est.contains(t), s"$t (freq $c) missing at parts=$parts")
          assert(
            est(t) <= c && est(t) >= c - n / (k + 1),
            s"$t est=${est(t)} true=$c parts=$parts")
        }
      }
    }
  }

  test("estimates never overcount, even for tail items") {
    val est = estimates(64, 7)
    val truth = planted
      .groupBy("token")
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    est.foreach { case (t, e) =>
      assert(e <= truth(t), s"$t overcounted: est=$e true=${truth(t)}")
    }
  }

  test("per-group summaries keep per-group guarantees") {
    val df = planted
      .withColumn("g", lit("a"))
      .union(
        Seq.fill(200)("beta").toDF("token").withColumn("g", lit("b")))
    val got = HeavyHitters
      .approxTopK(df.repartition(5), "token", keys = Seq("g"), k = 32)
      .select("g", "value", "est")
      .as[(String, String, Long)]
      .collect()
    val byGroup = got.groupBy(_._1)
    assert(byGroup("a").exists(_._2 == "hot1"))
    assert(byGroup("b").map(_._2).toSeq == Seq("beta"))
    assert(byGroup("b").head._3 == 200L) // only item in its group: exact
  }

  test("summary is k-bounded regardless of vocabulary size") {
    val got = HeavyHitters
      .approxTopK(planted, "token", k = 16, topN = 1000)
    assert(got.count() <= 16)
  }

  test("exactHeavyHitters equals the full groupBy-HAVING, any partitioning") {
    // support 2% of N=1240 → threshold 24.8: hot1/hot2/warm qualify,
    // every cold singleton does not
    val expected = planted
      .groupBy("token")
      .count()
      .where(col("count") * 50 >= lit(1240L) * 1)
      .as[(String, Long)]
      .collect()
      .toMap
    for (parts <- Seq(1, 7)) {
      val got = HeavyHitters
        .exactHeavyHitters(
          planted.repartition(parts),
          "token",
          supportNum = 1,
          supportDen = 50,
          k = 64)
        .as[(String, Long)]
        .collect()
        .toMap
      assert(got === expected, s"parts=$parts")
    }
    assert(expected.keySet === Set("hot1", "hot2", "warm"))
  }

  test("exactHeavyHitters boundary: a key EXACTLY at support is kept") {
    // 10 ×"edge" in N=200 at support 1/20 → count*20 == N*1 exactly
    val df =
      (Seq.fill(10)("edge") ++ (0 until 190).map(i => s"c$i")).toDF("token")
    val got = HeavyHitters
      .exactHeavyHitters(df.repartition(3), "token", 1, 20, k = 64)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(got === Map("edge" -> 10L))
  }

  test("exactHeavyHitters returns the NULL group when it clears support") {
    // 60% null keys at support 1/2: GROUP BY key HAVING returns the
    // (null, 12) group; MG can't track null, so the recount must carry
    // it unconditionally
    val df = (Seq.fill(12)(None: Option[String]) ++
      Seq.fill(5)(Some("a")) ++ (0 until 3).map(i => Some(s"c$i")))
      .toDF("token")
    val got = HeavyHitters
      .exactHeavyHitters(df.repartition(3), "token", 1, 2, k = 64)
      .collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
      .toMap
    assert(got === Map((None: Option[String]) -> 12L))
  }

  test("exactHeavyHitters rejects a capacity that voids the MG guarantee") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(planted, "token", 1, 100, k = 64)
    }
  }
}
