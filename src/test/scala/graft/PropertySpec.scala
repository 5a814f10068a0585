package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** SURVEY §5 port of the reference's configuration matrix: random UDF
  * compositions from the §2.2 scalar grammar × random partition counts —
  * the partition count must never change the result (the Spark analog of
  * "nb_workers doesn't change the answer", which is the reference's core
  * differential-testing stance). Seeded generation keeps runs
  * reproducible.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new Random(42)

  // the de-facto scalar grammar from the reference tests (SURVEY §2.2)
  private val unary: Seq[(String, Column => Column)] = Seq(
    "sin" -> sin _,
    "cos" -> cos _,
    "exp1" -> ((c: Column) => exp(-abs(c))),
    "sqrt1" -> ((c: Column) => sqrt(abs(c))),
    "log10p" -> ((c: Column) => log10(abs(c) + 1.0)),
    "sq" -> ((c: Column) => c * c))

  test("partition count never changes element-wise composition results") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_linenumber", "l_discount")
    (1 to 8).foreach { _ =>
      val chain = List.fill(3)(rng.nextInt(unary.size))
      val parts = 1 + rng.nextInt(16)
      val f = chain.map(unary(_)._2).foldLeft(identity[Column] _) {
        (acc, g) => (c: Column) => g(acc(c))
      }
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // compare multisets: sort by the full row including the value
      def run(p: Int) = li
        .repartition(p)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          f(col("l_discount")).as("v"))
        .as[(Long, Int, Double)]
        .collect()
        .sortBy(r => (r._1, r._2, r._3))
        .map(_._3)
      val a = run(1)
      val b = run(parts)
      assert(a.length === b.length)
      a.zip(b).foreach { case (x, y) =>
        assert(
          (x.isNaN && y.isNaN) || x == y,
          s"partition-dependent result for chain=$chain parts=$parts: $x vs $y")
      }
    }
  }

  test("partition count never changes global prefix scans (exact long path)") {
    import graft.ops.Windows
    val o = Tables.orders(spark, TestSpark.sf)
      .select(
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    def run(op: String, parts: Int): Array[(Long, Long)] =
      Windows
        .prefixScanScalable(o, "o_orderkey", "c", "out", op,
          numPartitions = parts)
        .as[(Long, Long)]
        .collect()
        .sortBy(_._1)
    Seq("sum", "max", "min").foreach { op =>
      val one = run(op, 1) // sequential ground truth: no carry at all
      Seq(3, 7, 16).foreach { p =>
        assert(
          run(op, p).sameElements(one),
          s"prefix $op differs between 1 and $p partitions")
      }
    }
  }

  test("partition count never changes dedup pair results") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, TestSpark.sf)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b")
        .as[(Long, Long)].collect().sortBy(identity).toSeq
    val partsList = Seq(1, 7, 32)
    // minhash, banded simhash and ngram jaccard are all deterministic
    // expressions over content — the partitioning must never matter
    val mh = partsList.map(p =>
      pairs(Dedup.minHashNearDup(docs.repartition(p), "text", "doc_id",
        shingleLen = 4, numHashes = 32, bands = 8, threshold = 0.4)))
    assert(mh.distinct.size === 1)
    val sh = partsList.map(p =>
      pairs(Dedup.simHashNearDupPairs(docs.repartition(p), "text", "doc_id")))
    assert(sh.distinct.size === 1)
    val nj = partsList.map(p =>
      pairs(Dedup.ngramJaccardPairs(docs.repartition(p), "text", "doc_id",
        n = 3, threshold = 0.2)))
    assert(nj.distinct.size === 1)
  }

  test("partition count never changes ngram-fraction or BPE pair counts") {
    import graft.operators.Dedup
    import graft.functions.Bpe
    val docs = Tables.documents(spark, TestSpark.sf)
    val partsList = Seq(1, 7, 32)
    // q149's count-over-window rewrite and q188's vocab aggregation are
    // exact integer pipelines — partitioning must never matter
    val nf = partsList.map(p =>
      Dedup.duplicatedNgramFraction(docs.repartition(p), "doc_id", "text", 5)
        .select("doc_id", "n_grams", "n_dup")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq)
    assert(nf.distinct.size === 1)
    val bp = partsList.map(p =>
      Bpe.pairCounts(Bpe.vocab(docs.repartition(p), "text"))
        .as[(String, String, Long)].collect().sortBy(identity).toSeq)
    assert(bp.distinct.size === 1)
  }

  test("partition count never changes time-offset rolling or cogroup results") {
    import graft.ops.{GroupApply, Windows}
    val ev = Tables.events(spark, TestSpark.sf)

    def rollRange(p: Int) = {
      val frame = Windows.rollingRangeFrame(
        col("ts"), Seq(col("user_id")), Windows.offsetNanos("24h"))
      ev.repartition(p)
        .select(
          col("user_id"),
          col("event_id"),
          count(col("value")).over(frame).as("n"))
        .as[(Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    }
    assert(Seq(1, 7, 32).map(rollRange).distinct.size === 1)

    val orders = Tables.orders(spark, TestSpark.sf).select("o_orderkey")
    val lines = Tables.lineitem(spark, TestSpark.sf).select("l_orderkey")
    def cog(p: Int) = GroupApply
      .cogroupApply[Long, (Long, Long)](
        orders.repartition(p), lines.repartition(p))(
        _.getLong(0), _.getLong(0)) { (k, os, ls) =>
        if (os.isEmpty) Iterator.empty else Iterator.single((k, ls.size.toLong))
      }
      .collect().sortBy(_._1).toSeq
    assert(Seq(1, 7, 32).map(cog).distinct.size === 1)
  }

  test("partition count never changes grouped aggregation results") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    (1 to 4).foreach { _ =>
      val parts = 1 + rng.nextInt(16)
      def run(p: Int) = li
        .repartition(p)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 4).as("s"),
          max("l_extendedprice").as("m"))
        .as[(String, Long, Double, Double)]
        .collect()
        .sortBy(_._1)
        .toSeq
      assert(run(1) === run(parts), s"parts=$parts")
    }
  }
}
