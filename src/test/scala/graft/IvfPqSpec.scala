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

  test("probing with a different source tag is an error, not wrong rows") {
    built
    val e = intercept[IllegalArgumentException] {
      ProductQuant.ivfPqProbe(spark, path, query, 10, 2, 30,
        sourceTag = "someothersource")
    }
    assert(e.getMessage.contains("cross-wire"))
  }
}
