package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ProductQuant, Similarity}

/** PQ/ADC against ground truth on the real embeddings table: recall vs
  * brute force, exactness of the refined scores, and determinism of
  * training/encoding under partitioning.
  */
class ProductQuantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, TestSpark.sf)
  private def query: Seq[Double] = emb
    .where(col("vec_id") === 0L)
    .select(col("embedding").cast("array<double>"))
    .as[Seq[Double]]
    .collect()(0)

  private lazy val cb =
    ProductQuant.pqTrain(emb, "embedding", "vec_id", m = 8, ksub = 16, iters = 3)

  test("codebooks have the declared shape") {
    assert(cb.length === 8)
    assert(cb.forall(_.length === 16))
    assert(cb.forall(_.forall(_.length === 8))) // 64 dims / 8 subspaces
  }

  test("PQ top-10 with refine=50 recalls most of the exact top-10") {
    val exact = Similarity
      .bruteForceTopK(emb, "embedding", "vec_id", query, 10)
      .select("id")
      .as[Long]
      .collect()
      .toSet
    val codes = ProductQuant.pqEncode(emb, "embedding", "vec_id", cb)
    val got = ProductQuant
      .pqTopK(codes, emb, "embedding", "vec_id", cb, query, k = 10, refine = 50)
      .select("id")
      .as[Long]
      .collect()
      .toSet
    val recall = (exact & got).size
    assert(recall >= 7, s"recall $recall/10 too low: exact=$exact got=$got")
  }

  test("refined scores ARE the exact cosines (re-rank is not approximate)") {
    val codes = ProductQuant.pqEncode(emb, "embedding", "vec_id", cb)
    val got = ProductQuant
      .pqTopK(codes, emb, "embedding", "vec_id", cb, query, k = 5, refine = 50)
      .as[(Long, Double)]
      .collect()
    val exactAll = Similarity
      .bruteForceTopK(emb, "embedding", "vec_id", query, 500)
      .as[(Long, Double)]
      .collect()
      .toMap
    got.foreach { case (id, cos) =>
      assert(math.abs(cos - exactAll(id)) < 1e-12, s"id=$id")
    }
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted.reverse)
  }

  test("training and encoding are partition-count invariant") {
    // centroid re-averaging sums doubles in partition order, so training
    // is deterministic only up to fp summation noise (~1e-16); encoding
    // given FIXED codebooks must be exactly invariant
    val cbMany = ProductQuant
      .pqTrain(emb.repartition(7), "embedding", "vec_id", 8, 16, iters = 3)
    val flat = cb.flatMap(_.flatMap(_.toSeq)).toSeq
    val flatMany = cbMany.flatMap(_.flatMap(_.toSeq)).toSeq
    flat.zip(flatMany).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-12, s"centroid drift: $x vs $y")
    }
    val a = ProductQuant
      .pqEncode(emb, "embedding", "vec_id", cb)
      .as[(Long, Array[Byte])]
      .collect()
      .map { case (id, c) => id -> c.toSeq }
      .toMap
    val b = ProductQuant
      .pqEncode(emb.repartition(5), "embedding", "vec_id", cb)
      .as[(Long, Array[Byte])]
      .collect()
      .map { case (id, c) => id -> c.toSeq }
      .toMap
    assert(a === b)
  }
}
