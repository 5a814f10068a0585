package graft

import org.scalatest.funsuite.AnyFunSuite

/** Run EVERY declared query end-to-end at sf0.001 — the repo's analogue of
  * the reference's run-everything parameterized matrix
  * (tests/test_pandarallel.py:10-22, every operator × every config).
  *
  * This is the gate `sbt test` was missing in round 3: two queries shipped
  * with an AnalysisException (a non-window function applied `.over(frame)`)
  * while every unit spec stayed green, because nothing ever analyzed the
  * full `SparkEntry.queries` map. A noop write forces full analysis AND
  * execution of every output column, so both analysis-time and runtime
  * failures surface here.
  */
class SmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("oracleSql keys are a subset of declared queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql entries without a query: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"query $name executes end-to-end") {
      SparkEntry
        .queries(name)(spark, sf)
        .write
        .format("noop")
        .mode("overwrite")
        .save()
    }
  }
}
