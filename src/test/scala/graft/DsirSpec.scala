package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR importance weights: distribution invariants, an exact
  * differential against an independent driver-side replay (own md5,
  * own counting), and the domain-affinity direction the score exists
  * to provide.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 64 // small bucket space keeps the replay readable

  private def md5Bucket(s: String, n: Int): Int = {
    val hex = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    (java.lang.Long.parseLong(hex.take(4), 16) % n).toInt
  }

  private def bigrams(text: String): Seq[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    if (t.length < 2) Seq.empty else t.sliding(2).map(_.mkString(" ")).toSeq
  }

  test("bucketDistribution covers every bucket and sums to 1") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val dist = Dsir.bucketDistribution(docs, "doc_id", "text", N)
      .as[(Int, Double)].collect()
    assert(dist.length == N)
    assert(math.abs(dist.map(_._2).sum - 1.0) < 1e-9)
    assert(dist.forall(_._2 > 0)) // Laplace floor: no zero anywhere
  }

  test("importanceWeights equals an independent driver-side replay") {
    val target = Seq((1L, "spark scala engine"), (2L, "spark catalyst plan"))
      .toDF("doc_id", "text")
    val rawRows = Seq(
      (10L, "spark scala engine runs fast"),
      (11L, "bananas are yellow fruit"),
      (12L, "spark catalyst plan optimizer"))
    val raw = rawRows.toDF("doc_id", "text")

    val got = Dsir
      .importanceWeights(raw, target, "doc_id", "text", nBuckets = N)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, w) => id -> ((n, w)) }.toMap

    // replay: bucket counts, Laplace distributions, per-doc sums
    def counts(rows: Seq[(Long, String)]): Map[Int, Long] =
      rows.flatMap(r => bigrams(r._2)).map(md5Bucket(_, N))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rc = counts(rawRows)
    val tc = counts(Seq((1L, "spark scala engine"), (2L, "spark catalyst plan")))
    val rTot = rc.values.sum.toDouble
    val tTot = tc.values.sum.toDouble
    def lr(b: Int): Double =
      math.log((tc.getOrElse(b, 0L) + 1.0) / (tTot + N)) -
        math.log((rc.getOrElse(b, 0L) + 1.0) / (rTot + N))
    rawRows.foreach { case (id, text) =>
      val bs = bigrams(text).map(md5Bucket(_, N))
      val expW = bs.groupBy(identity)
        .map { case (b, occ) => occ.size * lr(b) }.sum
      assert(got(id)._1 == bs.length.toLong, s"doc $id gram count")
      assert(math.abs(got(id)._2 - expW) < 1e-9, s"doc $id weight")
    }
  }

  test("on-domain raw docs outscore off-domain ones per gram") {
    val target = Seq((1L, "spark scala engine"), (2L, "spark catalyst plan"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (10L, "spark scala engine runs"),
      (11L, "bananas are yellow fruit today"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", nBuckets = N)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, lw) => id -> lw / n }.toMap
    assert(w(10L) > w(11L))
  }
}
