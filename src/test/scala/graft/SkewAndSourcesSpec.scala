package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewAndSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join equals plain join and spreads hot keys over salts") {
    val ev = Tables.events(spark, TestSpark.sf).select("event_id", "user_id", "value")
    val users = Tables
      .events(spark, TestSpark.sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("user_events"))

    val plain = ev
      .join(users, Seq("user_id"))
      .agg(sum("value"), sum("user_events"))
      .head()
    val salted = SkewJoin
      .salted(ev, users, "user_id", saltSource = col("event_id"), salts = 8)
      .agg(sum("value"), sum("user_events"))
      .head()
    assert(math.abs(plain.getDouble(0) - salted.getDouble(0)) < 1e-6)
    assert(plain.getLong(1) === salted.getLong(1))

    // row counts also identical (no dup/loss from replication)
    val n1 = ev.join(users, Seq("user_id")).count()
    val n2 = SkewJoin
      .salted(ev, users, "user_id", col("event_id"), 8)
      .count()
    assert(n1 === n2)
  }

  test("csv and json sources roundtrip a query result") {
    val df = SparkEntry
      .queries("q07_group_stats")(spark, TestSpark.sf)
    val csvDir = Files.createTempDirectory("graft-csv").toString
    val jsonDir = Files.createTempDirectory("graft-json").toString
    df.write.mode("overwrite").option("header", "true").csv(csvDir)
    df.write.mode("overwrite").json(jsonDir)

    val backCsv = spark.read
      .option("header", "true")
      .schema(df.schema)
      .csv(csvDir)
    val backJson = spark.read.schema(df.schema).json(jsonDir)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq.map {
        case x: Double => math.round(x * 1e6)
        case other => other
      }).sortBy(_.toString()).toSeq
    assert(canon(backCsv) === canon(df))
    assert(canon(backJson) === canon(df))
  }

  test("orc source roundtrips a query result (columnar alternative)") {
    val df = SparkEntry.queries("q07_group_stats")(spark, TestSpark.sf)
    val orcDir = Files.createTempDirectory("graft-orc").toString
    df.write.mode("overwrite").orc(orcDir)
    val back = spark.read.orc(orcDir)
    // ORC is typed like parquet — schema survives without a reader hint
    assert(back.schema === df.schema)
    assert(
      back.collect().map(_.toSeq).sortBy(_.toString()).toSeq ===
        df.collect().map(_.toSeq).sortBy(_.toString()).toSeq)
  }

  test("schema evolution: mergeSchema unions old and new parquet batches") {
    import spark.implicits._
    // a long-lived ingest dir accumulates batches whose schema widened
    // mid-stream — the reader must union the fields, null-filling the
    // column the old batch never had
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b"))
      .toDF("id", "name")
      .write
      .parquet(s"$dir/batch=0")
    Seq((3L, "c", 0.5))
      .toDF("id", "name", "score")
      .write
      .parquet(s"$dir/batch=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(
      merged.schema.fieldNames.toSet === Set("id", "name", "score", "batch"))
    val rows = merged
      .select("id", "score")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(0.5)))
    // without the hint, parquet serves ONE footer's schema — the
    // documented default; evolution is an explicit reader choice
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= merged.columns.length)
  }
}
