package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZOrder

/** Z-order layout: bit-level interleave ground truth, result invariance
  * (layout must never change query results), and the actual payoff —
  * file-skipping evidence counted from the written parquet footers.
  *
  * The honest comparison (first attempt got this wrong): for a box on
  * the SORTED dimension, a linear sort prunes at least as well as
  * z-order — that axis is exactly what it serves. Z-order's win is that
  * ONE layout serves predicates on EITHER dimension: the linear layout
  * degrades to reading every file the moment the predicate is on the
  * other column, while z-order keeps every file a small 2-D box. So the
  * spec measures worst-case files-read across both single-axis slabs.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleaveBits matches hand-computed Morton codes") {
    // 2 cols, 2 bits: z = y1 x1 y0 x0 (col index 0 gets the LOW bit)
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
    // e.g. (x=2 -> 10, y=1 -> 01) => z = y1 x1 y0 x0 = 0110 = 6
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 15L, 6L))
  }

  test("normalizeToBits maps range ends and nulls deterministically") {
    val df = Seq[Option[Double]](Some(0.0), Some(50.0), Some(100.0), None)
      .toDF("v")
      .select(
        ZOrder.normalizeToBits(col("v"), lit(0.0), lit(100.0), 4).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 8L, 15L, 0L))
    // degenerate range (min == max) collapses to 0, not NaN/overflow
    val const = Seq(7.0, 7.0).toDF("v")
      .select(ZOrder.normalizeToBits(col("v"), lit(7.0), lit(7.0), 4).as("n"))
    assert(const.as[Long].collect().toSeq == Seq(0L, 0L))
    // NaN values degrade to bucket 0 instead of failing the ANSI cast
    val nan = Seq(Double.NaN, 3.0).toDF("v")
      .select(ZOrder.normalizeToBits(col("v"), lit(0.0), lit(10.0), 4).as("n"))
    assert(nan.as[Long].collect().toSeq == Seq(0L, 5L))
  }

  test("null min/max stats (empty table, all-null column) degrade to bucket 0") {
    // all-null z-column: min/max are null — must take the degenerate-
    // range path, not NPE in the stats read
    val allNull = Seq[(Long, Option[Double])]((1L, None), (2L, None))
      .toDF("k", "v")
    val z = ZOrder.zValue(allNull, Seq("k", "v"), 4)
    assert(allNull.select(z.as("z")).as[Long].collect().forall(_ >= 0L))
    // empty table: stats row is all-null; writeZOrdered must still
    // produce a readable (empty) layout
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val path = "/tmp/graft-test-zorder-empty"
    ZOrder.writeZOrdered(empty, path, Seq("k", "v"), 4, 2)
    assert(spark.read.parquet(path).count() === 0L)
  }

  test("z-ordered layout returns exactly the original rows") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val path = "/tmp/graft-test-zorder-rows"
    ZOrder.writeZOrdered(li, path, Seq("l_quantity", "l_extendedprice"), 12, 8)
    // (l_orderkey, l_linenumber) is NOT unique in the fixtures — compare
    // under a total order over all columns
    val all = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .map(col)
    val a = li.orderBy(all: _*).collect().toSeq
    val b = spark.read.parquet(path).orderBy(all: _*).collect().toSeq
    assert(a == b)
  }

  test("one z-layout serves both axes; linear sort degrades on the second") {
    // independent uniform dims — no correlation between x and y
    val n = 20000
    val df = spark.range(n).select(
      (col("id") % 141).cast("double").as("x"),
      pmod(hash(col("id")), lit(139)).cast("double").as("y"))
    val files = 16
    val zPath = "/tmp/graft-test-zorder-z"
    val linPath = "/tmp/graft-test-zorder-lin"
    ZOrder.writeZOrdered(df, zPath, Seq("x", "y"), 10, files)
    df.repartitionByRange(files, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)

    // two ~10% single-axis slabs — the two query families one layout
    // must serve
    val slabX = Map("x" -> (10.0, 24.0))
    val slabY = Map("y" -> (30.0, 44.0))
    val (zt, zx) = ZOrder.fileOverlapCount(spark, zPath, slabX)
    val (_, zy) = ZOrder.fileOverlapCount(spark, zPath, slabY)
    val (lt, lx) = ZOrder.fileOverlapCount(spark, linPath, slabX)
    val (_, ly) = ZOrder.fileOverlapCount(spark, linPath, slabY)
    assert(zt == files && lt == files)
    // linear serves its sorted axis perfectly...
    assert(lx <= 3)
    // ...and reads EVERYTHING on the other axis
    assert(ly == files)
    // z-order: bounded on BOTH axes — worst case strictly better than
    // linear's worst case, by at least 2x
    val zWorst = math.max(zx, zy)
    val lWorst = math.max(lx, ly)
    assert(
      zWorst * 2 <= lWorst,
      s"z-order worst-axis $zWorst/$files vs linear worst-axis $lWorst/$files " +
        s"(z: x=$zx y=$zy; linear: x=$lx y=$ly)")

    // layout never changes results: both layouts agree with the source
    // on a 2-D box query
    def boxCount(p: String): Long =
      spark.read.parquet(p)
        .where(col("x").between(10, 24) && col("y").between(30, 44))
        .count()
    val expected = df
      .where(col("x").between(10, 24) && col("y").between(30, 44))
      .count()
    assert(boxCount(zPath) == expected && boxCount(linPath) == expected)
  }

  test("q187 plan pushes both range predicates to the parquet scan") {
    // scan metadata values (the PushedFilters list) render truncated to
    // spark.sql.maxMetadataStringLength chars — widen so the assertion
    // sees every pushed predicate
    val prev = spark.conf.getOption("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val plan = SparkEntry
        .queries("q187_zorder_box")(spark, TestSpark.sf)
        .queryExecution
        .executedPlan
        .toString
      assert(
        plan.contains("PushedFilters") &&
          plan.contains("GreaterThanOrEqual(l_quantity,10.0)") &&
          plan.contains("LessThanOrEqual(l_quantity,15.0)") &&
          plan.contains("GreaterThanOrEqual(l_extendedprice,20000.0)") &&
          plan.contains("LessThanOrEqual(l_extendedprice,30000.0)"),
        s"box predicates did not reach the scan:\n$plan")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.maxMetadataStringLength", v)
        case None => spark.conf.unset("spark.sql.maxMetadataStringLength")
      }
    }
  }
}
