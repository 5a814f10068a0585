package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ProductQuant, Similarity}

/** The combined IVF-PQ index: recall against brute force, exact scores
  * after the re-rank, partition pruning in the probe plan, and the
  * source-tag cross-wire guard.
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val path = "/tmp/graft-test-ivfpq"

  private def emb = Tables.embeddings(spark, TestSpark.sf)
  private def query: Seq[Double] = emb
    .where(col("vec_id") === 0L)
    .select(col("embedding").cast("array<double>"))
    .as[Seq[Double]]
    .collect()(0)

  private lazy val built: Unit =
    ProductQuant.ivfPqWriteIndex(
      emb.drop("label"),
      "embedding",
      "vec_id",
      path,
      kClusters = 8,
      m = 8,
      ksub = 16,
      iters = 3,
      sourceTag = "specsource")

  test("probe recalls most of the exact top-10; scores are exact cosines") {
    built
    val exact = Similarity
      .bruteForceTopK(emb, "embedding", "vec_id", query, 500)
      .as[(Long, Double)]
      .collect()
    val exactTop = exact.take(10).map(_._1).toSet
    val exactMap = exact.toMap
    val got = ProductQuant
      .ivfPqProbe(spark, path, query, k = 10, nprobe = 8, refine = 50,
        sourceTag = "specsource")
      .as[(Long, Double)]
      .collect()
    // nprobe = all 8 clusters: recall limited only by the PQ candidates
    val recall = (exactTop & got.map(_._1).toSet).size
    assert(recall >= 7, s"recall $recall/10: got=${got.map(_._1).toSeq}")
    got.foreach { case (id, cos) =>
      assert(math.abs(cos - exactMap(id)) < 1e-12, s"id=$id not exact")
    }
  }

  test("narrow probe still finds neighbors and prunes partitions") {
    built
    val probe = ProductQuant
      .ivfPqProbe(spark, path, query, k = 10, nprobe = 2, refine = 30,
        sourceTag = "specsource")
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && l.contains("cluster"))
    assert(pf.isDefined, s"no cluster partition filter in probe scan:\n$plan")
    val got = probe.as[(Long, Double)].collect()
    assert(got.length === 10)
    assert(got.map(_._1).contains(0L)) // the query vector itself
  }

  test("batch probe == per-query single probe, bitwise; plan prunes + pre-cuts") {
    built
    val qb = emb.where(col("vec_id").isin(0, 5, 9))
    val many = ProductQuant.ivfPqProbeMany(
      spark, path, qb, "embedding", "vec_id",
      k = 10, nprobe = 2, refine = 30, sourceTag = "specsource")
    val got = many
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq)
      .toMap
    for (qid <- Seq(0L, 5L, 9L)) {
      val qv = emb.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>"))
        .as[Seq[Double]].collect()(0)
      val single = ProductQuant
        .ivfPqProbe(spark, path, qv, k = 10, nprobe = 2, refine = 30,
          sourceTag = "specsource")
        .as[(Long, Double)].collect().toSeq
      assert(got(qid) === single, s"query $qid diverged from its single probe")
    }
    // the scale contract: one partition-pruned scan (cluster filter),
    // ADC pass column-pruned to (id, code), per-query cuts pre-pruned
    // map-side (WindowGroupLimit)
    val plan = many.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && l.contains("cluster"))
    assert(pf.isDefined, s"no cluster partition filter in batch probe:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query cut must push WindowGroupLimit:\n$plan")
  }

  test("batch probe past the literal cap: semi-join restriction, pruned ADC leg") {
    built
    // nq·refine = 3·350 > LiteralKeyCap forces the broadcast left-semi
    // restriction — the candidate subplan then sits INSIDE this plan,
    // where its scan must be column-pruned to (id, code): the PQ I/O
    // win survives the batch shape
    val qb = emb.where(col("vec_id").isin(0, 5, 9))
    val many = ProductQuant.ivfPqProbeMany(
      spark, path, qb, "embedding", "vec_id",
      k = 10, nprobe = 2, refine = 350, sourceTag = "specsource")
    val got = many
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq)
      .toMap
    // the restriction path must not change answers: single probe at the
    // same refine (its own literal path) is the ground truth
    for (qid <- Seq(0L, 5L, 9L)) {
      val qv = emb.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>"))
        .as[Seq[Double]].collect()(0)
      val single = ProductQuant
        .ivfPqProbe(spark, path, qv, k = 10, nprobe = 2, refine = 350,
          sourceTag = "specsource")
        .as[(Long, Double)].collect().toSeq
      assert(got(qid) === single, s"query $qid diverged past the literal cap")
    }
    val plan = many.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"expected the broadcast left-semi restriction past the cap:\n$plan")
    val adcScan = plan.linesIterator.find(l =>
      l.contains("ReadSchema") && l.contains("code:binary") &&
        !l.contains("v:array"))
    assert(adcScan.isDefined,
      s"ADC pass must read codes without the float vectors:\n$plan")
  }

  test("probing with a different source tag is an error, not wrong rows") {
    built
    val e = intercept[IllegalArgumentException] {
      ProductQuant.ivfPqProbe(spark, path, query, 10, 2, 30,
        sourceTag = "someothersource")
    }
    assert(e.getMessage.contains("cross-wire"))
  }
}
