package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Count-Min guarantees, checked against exact counts on planted
  * skewed data, plus the merge-exactness property that distinguishes
  * CMS from Misra–Gries: partial aggregation is bit-for-bit
  * partitioning-invariant because merge is a plain matrix sum.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // zipf-ish stream: key i appears ~600/i times, 200 distinct keys
  private lazy val stream: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill(600 / i)(s"key$i"))
  private lazy val exact: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("never undercounts; overcount within e/width * N on every key") {
    val width = 1024
    val df = stream.toDF("v")
    val est = Sketches
      .cmsFrequencies(df, "v", probes = exact.keys.toSeq, width = width)
      .select("value", "est", "n_total")
      .as[(String, Long, Long)]
      .collect()
    val n = stream.size.toLong
    est.foreach { case (k, e, nt) =>
      assert(nt === n)
      assert(e >= exact(k), s"$k undercounted: $e < ${exact(k)}")
      assert(
        e <= exact(k) + math.ceil(math.E / width * n).toLong,
        s"$k overcounted past the CM bound: $e vs true ${exact(k)}")
    }
    // an absent key estimates at most eps*N (and here, exactly 0)
    val absent = Sketches
      .cmsFrequencies(df, "v", probes = Seq("nope"), width = width)
      .select("est").as[Long].head()
    assert(absent <= math.ceil(math.E / width * stream.size).toLong)
  }

  test("forced collisions overcount but never undercount") {
    // width 2, depth 1: every key lands in one of two cells — estimates
    // are cell sums, far above truth, but still >= truth for every key
    val df = stream.toDF("v")
    val est = Sketches
      .cmsFrequencies(df, "v", probes = exact.keys.toSeq,
        width = 2, depth = 1)
      .select("value", "est").as[(String, Long)].collect()
    est.foreach { case (k, e) => assert(e >= exact(k)) }
    assert(est.map(_._2).max > exact.values.max) // collisions really hit
  }

  test("sketch is bit-identical across partition shapes (exact merge)") {
    val df = stream.toDF("v")
    def table(parts: Int): Seq[Long] = df
      .repartition(parts)
      .agg(Sketches.cmsSketchAgg(col("v"), 256, 3).as("cms"))
      .select("cms.table").as[Seq[Long]].head()
    val one = table(1)
    assert(table(7) === one)
    assert(table(32) === one)
    assert(one.sum === stream.size.toLong * 3) // each insert bumps 3 rows
  }

  test("grouped frequencies estimate per group; nulls not inserted") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"),
      ("b", null), ("b", null)).toDF("g", "v")
    val out = Sketches
      .cmsFrequencies(df, "v", probes = Seq("x", "y"), keys = Seq("g"))
      .select("g", "value", "est", "n_total")
      .as[(String, String, Long, Long)]
      .collect()
      .map { case (g, v, e, nt) => (g, v) -> ((e, nt)) }
      .toMap
    assert(out(("a", "x")) === ((2L, 3L)))
    assert(out(("a", "y")) === ((1L, 3L)))
    assert(out(("b", "x")) === ((1L, 1L))) // nulls neither counted nor inserted
    assert(out(("b", "y"))._1 === 0L)
  }

  test("driver-side point estimate agrees with the in-plan UDF") {
    val df = stream.toDF("v")
    val sk = df
      .agg(Sketches.cmsSketchAgg(col("v"), 512, 4).as("cms"))
      .select("cms.width", "cms.depth", "cms.n", "cms.table")
      .as[(Int, Int, Long, Seq[Long])].head()
    val sketch = Sketches.CMSketch(sk._1, sk._2, sk._3, sk._4.toArray)
    val inPlan = Sketches
      .cmsFrequencies(df, "v", probes = Seq("key1", "key13", "zz"),
        width = 512, depth = 4)
      .select("value", "est").as[(String, Long)].collect().toMap
    Seq("key1", "key13", "zz").foreach { k =>
      assert(Sketches.cmsPointEstimate(sketch, k) === inPlan(k))
    }
  }
}
