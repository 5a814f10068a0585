package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q209 (tokenizer-aware mixture schedule): the schedule math replayed
  * driver-side over q197's own per-doc BPE counts — the differential a
  * rows-only query owes (the trained merge list is not
  * SQL-expressible, so no DuckDB oracle can price the tokens).
  */
class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q209 equals a driver replay of the α=0.5 schedule over q197 counts") {
    val d = TestSpark.sf
    val got = SparkEntry
      .queries("q209_bpe_mixture")(spark, d)
      .collect()
      .map(r =>
        r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5))))
      .toMap
    // independent aggregation: per-source BPE token mass from q197's
    // output joined to the documents table, then the schedule in
    // plain Scala
    val perDoc = SparkEntry
      .queries("q197_bpe_encode")(spark, d)
      .select("doc_id", "n_bpe_tokens")
      .as[(Long, Long)]
      .collect()
      .toMap
    val srcOf = Tables
      .documents(spark, d)
      .select("doc_id", "source")
      .as[(Long, String)]
      .collect()
      .toMap
    val bySrc = perDoc.toSeq
      .groupBy { case (id, _) => srcOf(id) }
      .map { case (s, xs) => s -> xs.map(_._2).sum }
    val total = bySrc.values.sum.toDouble
    val wRawSum = bySrc.values.map(n => math.sqrt(n / total)).sum
    val budget = 1e7
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (s, n) =>
      val share = n / total
      val weight = math.sqrt(share) / wRawSum
      val (gn, gShare, gWeight, gSampled, gEpochs) = got(s)
      assert(gn === n, s"source $s tokens")
      assert(math.abs(gShare - share) < 1e-6, s"source $s share")
      assert(math.abs(gWeight - weight) < 1e-6, s"source $s weight")
      assert(math.abs(gSampled - budget * weight) < 0.5 + 1e-6 * budget,
        s"source $s sampled")
      assert(math.abs(gEpochs - budget * weight / n) < 1e-4,
        s"source $s epochs")
    }
    // the α-schedule's defining property: sub-linear boosting — the
    // smallest source's weight exceeds its share, the largest's is
    // below it (strict when shares differ)
    if (bySrc.size > 1) {
      val minSrc = bySrc.minBy(_._2)._1
      val maxSrc = bySrc.maxBy(_._2)._1
      if (bySrc(minSrc) != bySrc(maxSrc)) {
        assert(got(minSrc)._3 > got(minSrc)._2)
        assert(got(maxSrc)._3 < got(maxSrc)._2)
      }
    }
  }
}
