package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinearModel

/** Logistic-regression training/scoring correctness: an exact
  * driver-side replay of the full-batch GD recursion (same features,
  * same update rule, sequential arithmetic), class separation on
  * planted vocabularies, and the degenerate-doc scoring contract.
  */
class LinearModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** md5-bucket of a bigram — must match Dsir.hashedBigramBuckets. */
  private def bucketOf(u: String, w: String, nBuckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$u $w".getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString // first 4 hex chars
    java.lang.Math.floorMod(java.lang.Long.parseLong(hex, 16), nBuckets.toLong)
      .toInt
  }

  /** Sequential replay of LinearModel.train on a driver-side corpus. */
  private def replay(
      corpus: Seq[(Long, String, Double)],
      nBuckets: Int,
      rounds: Int,
      lr: Double): (Array[Double], Double) = {
    val feats: Seq[(Long, Map[Int, Double], Double)] = corpus.flatMap {
      case (id, text, y) =>
        val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (t.length < 2) None
        else {
          val counts = t.zip(t.tail)
            .groupBy { case (u, w) => bucketOf(u, w, nBuckets) }
            .map { case (b, g) => b -> g.size.toDouble }
          val n = counts.values.sum
          Some((id, counts.map { case (b, c) => b -> c / n }, y))
        }
    }
    val w = new Array[Double](nBuckets + 1) // last = intercept
    for (_ <- 1 to rounds) {
      val g = new Array[Double](nBuckets + 1)
      feats.foreach { case (_, x, y) =>
        val m = x.map { case (b, v) => v * w(b) }.sum + w(nBuckets)
        val err = 1.0 / (1.0 + math.exp(-m)) - y
        x.foreach { case (b, v) => g(b) += v * err }
        g(nBuckets) += err
      }
      for (i <- 0 to nBuckets) w(i) -= lr * g(i) / feats.size
    }
    (w.take(nBuckets), w(nBuckets))
  }

  private val planted: Seq[(Long, String, Double)] = {
    val spamV = Vector("buy", "now", "free", "click", "offer", "win")
    val hamV = Vector("the", "merge", "plan", "joins", "scan", "filter")
    // cyclic walk from a per-doc start: every doc of a class carries
    // the class's shared bigram set (so held-out docs are classifiable),
    // with doc-varying counts
    def doc(v: Vector[String], i: Int) =
      (0 until 12).map(j => v((i + j) % v.size)).mkString(" ")
    (0 until 30).map(i => (i.toLong, doc(spamV, i), 1.0)) ++
      (0 until 30).map(i => (100L + i, doc(hamV, i), 0.0))
  }

  test("distributed GD equals a sequential driver-side replay") {
    val df = planted.toDF("doc_id", "text", "y")
    val m = LinearModel.train(
      df, "doc_id", "text", "y", nBuckets = 64, rounds = 6, lr = 2.0)
    val (rw, rb) = replay(planted, nBuckets = 64, rounds = 6, lr = 2.0)
    assert(math.abs(m.bias - rb) < 1e-9, s"bias ${m.bias} vs $rb")
    (0 until 64).foreach { i =>
      assert(
        math.abs(m.weights(i) - rw(i)) < 1e-9,
        s"w($i): ${m.weights(i)} vs ${rw(i)}")
    }
  }

  test("trained model separates planted classes on held-out docs") {
    val train = planted.filter(_._1 % 3 != 0)
    val heldOut = planted.filter(_._1 % 3 == 0)
    val m = LinearModel.train(
      train.toDF("doc_id", "text", "y"), "doc_id", "text", "y",
      nBuckets = 64, rounds = 40, lr = 4.0)
    val scores = LinearModel
      .score(heldOut.toDF("doc_id", "text", "y"), "doc_id", "text", m)
      .as[(Long, Double)].collect().toMap
    heldOut.foreach { case (id, _, y) =>
      if (y == 1.0) assert(scores(id) > 0.5, s"spam doc $id scored ${scores(id)}")
      else assert(scores(id) < 0.5, s"ham doc $id scored ${scores(id)}")
    }
  }

  test("docs with no bigram score the prior sigmoid(bias)") {
    val m = LinearModel.Model(Array.fill(8)(9.9), bias = 1.5, nBuckets = 8)
    val scored = LinearModel
      .score(
        Seq((1L, "solitary"), (2L, ""), (3L, "two tokens"))
          .toDF("doc_id", "text"),
        "doc_id", "text", m)
      .as[(Long, Double)].collect().toMap
    val prior = 1.0 / (1.0 + math.exp(-1.5))
    assert(math.abs(scored(1L) - prior) < 1e-12) // one token: no bigram
    assert(math.abs(scored(2L) - prior) < 1e-12) // empty text
    assert(scored(3L) > 0.99) // real bigram hits a 9.9 weight
    // row-preserving: every input doc comes back scored
    assert(scored.size === 3)
  }

  test("training on an all-degenerate corpus fails loudly") {
    val df = Seq((1L, "x", 1.0), (2L, "", 0.0)).toDF("doc_id", "text", "y")
    val e = intercept[IllegalArgumentException] {
      LinearModel.train(df, "doc_id", "text", "y", nBuckets = 8, rounds = 1)
    }
    assert(e.getMessage.contains("empty training corpus"))
  }
}
