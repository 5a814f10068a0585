package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangModel

/** Kneser–Ney bigram LM: hand-computed probabilities on a tiny corpus,
  * the normalization invariant (the discounted mass plus the
  * continuation mass is exactly 1 per context), and perplexity against
  * closed-form geometric means.
  */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 0.75

  // corpus: "a b a b", "a b c"
  // bc: (a,b)=3 (b,a)=1 (b,c)=1; B=3
  // cu: a -> (c_u=3, n1u=1); b -> (c_u=2, n1u=2)
  // cw: n1w(a)=1 n1w(b)=1 n1w(c)=1
  private val pAB = (3 - d) / 3.0 + (d * 1 / 3.0) * (1 / 3.0) // P(b|a)
  private val pBA = (1 - d) / 2.0 + (d * 2 / 2.0) * (1 / 3.0) // P(a|b)
  private val pBC = pBA // symmetric counts                     P(c|b)

  private def corpus = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")

  test("knBigramLm matches hand-computed interpolated-KN probabilities") {
    val lm = LangModel
      .knBigramLm(corpus, "doc_id", "text")
      .as[(String, String, Long, Double)]
      .collect()
      .map { case (u, w, c, p) => (u, w) -> ((c, p)) }
      .toMap
    assert(lm.keySet == Set(("a", "b"), ("b", "a"), ("b", "c")))
    assert(lm(("a", "b"))._1 == 3L)
    assert(math.abs(lm(("a", "b"))._2 - pAB) < 1e-12)
    assert(math.abs(lm(("b", "a"))._2 - pBA) < 1e-12)
    assert(math.abs(lm(("b", "c"))._2 - pBC) < 1e-12)
  }

  test("per-context probability mass sums to exactly 1 (discount + continuation)") {
    // sum over SEEN followers of max(c-d,0)/c_u plus the full
    // continuation mass d*n1u/c_u must be 1 for every context — the
    // property that makes interpolated KN a distribution
    val docs = Tables.documents(spark, TestSpark.sf).limit(50)
    val lm = LangModel.knBigramLm(docs, "doc_id", "text")
    val mass = lm
      .groupBy("u")
      .agg(
        (sum(greatest(col("c_uw").cast("double") - d, lit(0.0))) /
          sum(col("c_uw")) +
          lit(d) * count(lit(1)) / sum(col("c_uw"))).as("m"))
      .as[(String, Double)]
      .collect()
    assert(mass.nonEmpty)
    mass.foreach { case (u, m) =>
      assert(math.abs(m - 1.0) < 1e-9, s"context '$u' mass $m")
    }
  }

  test("docPerplexity is the geometric-mean inverse probability") {
    val got = LangModel
      .docPerplexity(corpus, "doc_id", "text")
      .as[(Long, Long, Double)]
      .collect()
      .map { case (id, n, p) => id -> ((n, p)) }
      .toMap
    // doc 1: bigrams (a,b),(b,a),(a,b) -> ppl = (pAB*pBA*pAB)^(-1/3)
    val exp1 = math.pow(pAB * pBA * pAB, -1.0 / 3)
    // doc 2: (a,b),(b,c) -> (pAB*pBC)^(-1/2)
    val exp2 = math.pow(pAB * pBC, -1.0 / 2)
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - exp1) < 1e-9)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - exp2) < 1e-9)
  }

  test("single-token and empty docs are excluded, not errored") {
    val df = Seq((1L, "only"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    val out = LangModel.docPerplexity(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(3L))
  }
}
