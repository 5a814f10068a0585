package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.api.Pandarallel._

/** Facade differential fuzz: 1000+ random configurations from the
  * SURVEY §2.2 scalar grammar driven through the reference-shaped
  * facade verbs (parallelApplyExpr / parallelApplymap / typed
  * parallelMap / grouped apply / rolling / expanding / ewm, over random
  * windows, minPeriods, center, closed) and compared against the
  * SINGLE-PARTITION run of the same verb — the reference's own
  * differential stance (`df.apply(f).equals(df.parallel_apply(f))`,
  * tests/test_pandarallel.py:192-194 and its named/lambda × size ×
  * transport matrix) with the partition count as the varied dimension.
  * PropertySpec pins fixed shapes; this sweeps the attribute space.
  *
  * Cases are BATCHED into wide plans — many random configs become many
  * output columns of one job — so the 1000+ cases cost dozens of Spark
  * jobs, not thousands. Seeded generation keeps failures reproducible.
  */
class FacadeFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new Random(0xFACADE)

  // the de-facto scalar grammar (SURVEY §2.2): NaN-free by construction
  // (abs-guarded roots/logs), so only true nulls flow as nulls
  private val unary: Seq[Column => Column] = Seq(
    sin(_),
    cos(_),
    (c: Column) => exp(-abs(c)),
    (c: Column) => sqrt(abs(c)),
    (c: Column) => log10(abs(c) + 1.0),
    (c: Column) => c * c,
    (c: Column) => c * 0.5 + 1.25,
    (c: Column) => negate(c))

  private def randomChain(): Column => Column = {
    val picks = List.fill(1 + rng.nextInt(4))(rng.nextInt(unary.size))
    c => picks.foldLeft(c)((acc, i) => unary(i)(acc))
  }

  private def ev: DataFrame =
    Tables.events(spark, TestSpark.sf).select("event_id", "user_id", "value")

  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <=
        1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def cellsClose(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null)           => true
    case (x: Double, y: Double) => close(x, y)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.lazyZip(y).forall(cellsClose)
    case (x, y) => x == y
  }

  /** Collect rows sorted by the leading long id column. */
  private def collectById(df: DataFrame): Array[Array[Any]] =
    df.collect().map(_.toSeq.toArray).sortBy(_(0).asInstanceOf[Long])

  /** run(1) is the sequential ground truth; every other partition count
    * must reproduce it cell-for-cell.
    */
  private def compareRuns(
      what: String,
      parts: Seq[Int] = Seq(7, 32))(run: Int => Array[Array[Any]]): Unit = {
    val base = run(1)
    assert(base.nonEmpty, s"$what: empty ground truth")
    parts.foreach { p =>
      val got = run(p)
      assert(got.length === base.length, s"$what: row count at parts=$p")
      base.zip(got).zipWithIndex.foreach { case ((x, y), i) =>
        x.indices.foreach { j =>
          assert(
            cellsClose(x(j), y(j)),
            s"$what: cell($i,$j) differs at parts=$p: ${x(j)} vs ${y(j)}")
        }
      }
    }
  }

  test("fuzz: 256 element-wise chains through parallelApplyExpr") {
    val chains = Seq.fill(256)(randomChain())
    val outs = ("event_id" -> col("event_id")) +:
      chains.zipWithIndex.map { case (f, i) => s"c$i" -> f(col("value")) }
    compareRuns("applyExpr") { p =>
      collectById(ev.repartition(p).parallelApplyExpr(outs: _*))
    }
  }

  test("fuzz: 12 chains through parallelApplymap (every column)") {
    // applymap transforms every column (ids included), so rows are
    // compared as a multiset via a canonical sort
    Seq.fill(12)(randomChain()).zipWithIndex.foreach { case (f, i) =>
      compareRuns(s"applymap#$i", Seq(7)) { p =>
        ev.repartition(p)
          .parallelApplymap(c => f(c.cast("double")))
          .collect()
          .map(_.toSeq.toArray)
          .sortBy(_.mkString(""))
      }
    }
  }

  test("fuzz: 100 affine maps through typed black-box parallelMap") {
    val params =
      Seq.fill(100)((rng.nextDouble() * 4 - 2, rng.nextDouble() * 10 - 5))
    val f = (t: (Long, Long, Option[Double])) =>
      (t._1, params.map { case (a, b) =>
        t._3.map(v => a * v + b).getOrElse(Double.NaN)
      })
    compareRuns("typedMap") { p =>
      collectById(
        ev.as[(Long, Long, Option[Double])]
          .repartition(p)
          .parallelMap(f)
          .toDF())
    }
  }

  test("fuzz: 120 aggregate compositions through grouped apply") {
    val aggs: Seq[Column => Column] = Seq(
      sum(_),
      avg(_),
      min(_),
      max(_),
      (c: Column) => count(c).cast("double"),
      stddev_samp(_))
    val cfgs = Seq.fill(120)((randomChain(), rng.nextInt(aggs.size)))
    val exprs = cfgs.zipWithIndex.map { case ((ch, a), i) =>
      aggs(a)(ch(col("value"))).as(s"a$i")
    }
    compareRuns("groupedAgg") { p =>
      collectById(
        ev.repartition(p).parallelGroupBy("user_id").apply(exprs: _*))
    }
  }

  test("fuzz: 320 rolling attribute combinations through grouped rolling") {
    val aggs: Seq[Column => Column] = Seq(
      sum(_),
      avg(_),
      min(_),
      max(_),
      // count stays un-cast: wrapping the aggregate in a cast before
      // .over() detaches it from the window (Catalyst plans a global
      // Aggregate and fails MISSING_GROUP_BY); long cells compare exact
      count(_),
      stddev_samp(_))
    val closedChoices = Seq("right", "left", "both", "neither")
    val cfgs = Seq.fill(320) {
      val w = 1 + rng.nextInt(10)
      (w,
        if (rng.nextBoolean()) Some(rng.nextInt(w + 1)) else None,
        rng.nextBoolean(),
        closedChoices(rng.nextInt(closedChoices.size)),
        rng.nextInt(aggs.size),
        randomChain())
    }
    cfgs.grouped(20).zipWithIndex.foreach { case (batch, g) =>
      compareRuns(s"rolling batch#$g", Seq(7)) { p =>
        val out = batch.zipWithIndex.foldLeft(ev.repartition(p)) {
          case (df, ((w, mp, center, closed, a, ch), i)) =>
            df.parallelGroupBy("user_id")
              .rolling(w, col("event_id"), center, closed)
              .parallelAgg(ch(col("value")), mp)(aggs(a))
              .withColumnRenamed("__rolling__", s"r$i")
        }
        collectById(out)
      }
    }
  }

  test("fuzz: 120 expanding minPeriods/agg combinations") {
    val aggs: Seq[Column => Column] = Seq(
      sum(_),
      avg(_),
      min(_),
      max(_),
      count(_),
      stddev_samp(_))
    val cfgs = Seq.fill(120)(
      (1 + rng.nextInt(10), rng.nextInt(aggs.size), randomChain()))
    cfgs.grouped(20).zipWithIndex.foreach { case (batch, g) =>
      compareRuns(s"expanding batch#$g", Seq(7)) { p =>
        val out = batch.zipWithIndex.foldLeft(ev.repartition(p)) {
          case (df, ((mp, a, ch), i)) =>
            df.parallelGroupBy("user_id")
              .expanding(col("event_id"))
              .parallelAgg(ch(col("value")), s"e$i", mp)(aggs(a))
        }
        collectById(out)
      }
    }
  }

  test("fuzz: 48 ewm alphas through grouped ewm mean/var") {
    val cfgs = Seq.fill(48)(
      (rng.nextDouble() * 0.98 + 0.01, rng.nextBoolean()))
    cfgs.grouped(6).zipWithIndex.foreach { case (batch, g) =>
      compareRuns(s"ewm batch#$g", Seq(7)) { p =>
        val out = batch.zipWithIndex.foldLeft(ev.repartition(p)) {
          case (df, ((alpha, isVar), i)) =>
            val e = df.parallelGroupBy("user_id").ewm(alpha, col("event_id"))
            if (isVar) e.parallelVar("value", s"w$i")
            else e.parallelMean("value", s"w$i")
        }
        collectById(out)
      }
    }
  }

  test("fuzz: 32 black-box rolling UDF attribute combinations") {
    // non-algebraic UDF (index-weighted mean) — the path the reference
    // exists for; the UDF sees the materialized frame in order, so the
    // result is partition-independent iff the frame construction is
    val f = (xs: Seq[Double]) => {
      var s = 0.0
      var w = 0.0
      xs.zipWithIndex.foreach { case (v, i) => s += v * (i + 1); w += i + 1 }
      if (w == 0) 0.0 else s / w
    }
    val closedChoices = Seq("right", "left", "both", "neither")
    val cfgs = Seq.fill(32) {
      val w = 1 + rng.nextInt(8)
      (w,
        if (rng.nextBoolean()) Some(rng.nextInt(w + 1)) else None,
        rng.nextBoolean(),
        closedChoices(rng.nextInt(closedChoices.size)))
    }
    cfgs.grouped(8).zipWithIndex.foreach { case (batch, g) =>
      compareRuns(s"rollingApply batch#$g", Seq(7)) { p =>
        val out = batch.zipWithIndex.foldLeft(ev.repartition(p)) {
          case (df, ((w, mp, center, closed), i)) =>
            df.parallelGroupBy("user_id")
              .rolling(w, col("event_id"), center, closed)
              .parallelApply(col("value"), s"b$i", mp)(f)
        }
        collectById(out)
      }
    }
  }
}
