package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-contract guard (FIXTURES.md §B). The r7 post-mortem: the
  * driver regenerated /root/testdata and `events.ts` changed physical
  * type (TIMESTAMP(NANOS) → timestamp[us]) — 22 queries died at analysis
  * before any spec noticed. This spec pins the DECLARED schema of every
  * table at every scale factor with a readable per-column diff, so a
  * fixture regeneration that drifts from FIXTURES.md fails here first,
  * with a message naming the table, column, and both types.
  *
  * The reference's analog is its cross-version CI matrix
  * (reference .github/workflows/run_tests.yml:19-42): pin the input
  * contract, not just the outputs.
  *
  * Timestamp columns are declared "timestamp" in FIXTURES.md without
  * tz-ness; parquet writers legitimately produce either TIMESTAMP_LTZ or
  * TIMESTAMP_NTZ (isAdjustedToUTC) — both are accepted and the
  * engine-side seam ([[Tables.normalizeEventTs]]) owns the difference.
  */
class SchemaContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Declared column → acceptable Spark types. "ts"-style timestamp
    * columns accept both tz flavors plus LongType (a fixture generation
    * that pre-bakes epoch-nanos longs is the engine's canonical form).
    */
  private val TS: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val TSorLong: Set[DataType] = TS + LongType

  private def exact(t: DataType): Set[DataType] = Set(t)

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "lineitem" -> Seq(
      "l_orderkey" -> exact(LongType),
      "l_partkey" -> exact(LongType),
      "l_suppkey" -> exact(LongType),
      "l_linenumber" -> exact(IntegerType),
      "l_quantity" -> exact(DoubleType),
      "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType),
      "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType),
      "l_linestatus" -> exact(StringType),
      "l_shipdate" -> TS),
    "orders" -> Seq(
      "o_orderkey" -> exact(LongType),
      "o_custkey" -> exact(LongType),
      "o_orderstatus" -> exact(StringType),
      "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> TS,
      "o_orderpriority" -> exact(StringType)),
    "customer" -> Seq(
      "c_custkey" -> exact(LongType),
      "c_name" -> exact(StringType),
      "c_nationkey" -> exact(IntegerType),
      "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> exact(IntegerType),
      "n_name" -> exact(StringType),
      "n_regionkey" -> exact(IntegerType)),
    "region" -> Seq(
      "r_regionkey" -> exact(IntegerType),
      "r_name" -> exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> exact(LongType),
      "s_name" -> exact(StringType),
      "s_nationkey" -> exact(IntegerType),
      "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> exact(LongType),
      "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType),
      "p_type" -> exact(StringType),
      "p_size" -> exact(IntegerType),
      "p_retailprice" -> exact(DoubleType)),
    "events" -> Seq(
      "event_id" -> exact(LongType),
      "ts" -> TSorLong,
      "user_id" -> exact(LongType),
      "event_type" -> exact(StringType),
      "value" -> exact(DoubleType),
      "props" -> exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> exact(LongType),
      "text" -> exact(StringType),
      "lang" -> exact(StringType),
      "source" -> exact(StringType),
      "n_chars" -> exact(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> exact(LongType),
      "embedding" -> Set(ArrayType(FloatType, true), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType, LongType))
  )

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")

  private def diff(
      table: String,
      actual: StructType,
      expected: Seq[(String, Set[DataType])]): Seq[String] = {
    val actualByName = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = expected.collect {
      case (name, _) if !actualByName.contains(name) =>
        s"$table.$name: MISSING (declared in FIXTURES.md)"
    }
    val extra = actual.fields.collect {
      case f if !expected.exists(_._1 == f.name) =>
        s"$table.${f.name}: UNDECLARED extra column (${f.dataType.simpleString})"
    }
    val wrongType = expected.collect {
      case (name, ok) if actualByName.get(name).exists(t => !ok(t)) =>
        val got = actualByName(name).simpleString
        val want = ok.map(_.simpleString).toSeq.sorted.mkString(" | ")
        s"$table.$name: TYPE DRIFT got $got, contract allows {$want}"
    }
    val order = {
      val declaredOrder = expected.map(_._1)
      val actualOrder = actual.fields.map(_.name).filter(declaredOrder.contains)
      if (actualOrder.toSeq != declaredOrder)
        Seq(s"$table: column ORDER drift got ${actualOrder.mkString(",")} " +
          s"declared ${declaredOrder.mkString(",")}")
      else Seq.empty
    }
    missing ++ extra ++ wrongType ++ order
  }

  for (dir <- sfDirs; (table, expected) <- contract.toSeq.sortBy(_._1)) {
    test(s"$dir/$table matches the FIXTURES.md contract") {
      val schema = spark.read.parquet(s"$dir/$table.parquet").schema
      val problems = diff(table, schema, expected)
      assert(
        problems.isEmpty,
        s"\nFixture contract violated at $dir:\n  " + problems.mkString("\n  "))
    }
  }

  test("Tables.events normalizes ts to epoch-nanos long at every sf") {
    for (dir <- sfDirs) {
      val df = Tables.events(spark, dir)
      assert(
        df.schema("ts").dataType == LongType,
        s"$dir: engine-facing events.ts must be LongType (epoch nanos), " +
          s"got ${df.schema("ts").dataType.simpleString}")
    }
  }

  test("normalized ts values agree with the parquet timestamps (micros grid)") {
    val dir = sfDirs.head
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        val joined = Tables
          .events(spark, dir)
          .select(col("event_id"), col("ts").as("ns"))
          .join(
            raw.select(
              col("event_id"),
              unix_micros(col("ts").cast("timestamp")).as("us")),
            "event_id")
        val bad =
          joined.where(col("ns") =!= col("us") * lit(1000L)).count()
        assert(bad == 0L, s"$bad rows where normalized ns != parquet micros*1000")
      case LongType => succeed // old-style fixtures: pass-through is identity
      case other => fail(s"unexpected raw ts type ${other.simpleString}")
    }
  }
}
