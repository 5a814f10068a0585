package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer. The reference has no sources at all — input is an
  * in-memory pandas object (SURVEY §2.2 "Scans"); our engine reads the
  * driver-generated parquet star schema (TESTDATA.md).
  *
  * Filters/projections declared on these frames reach the parquet scan
  * (PushedFilters / ReadSchema in `.explain`) — free via Catalyst.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")

  /** Events with `ts` normalized to the engine's canonical representation:
    * epoch NANOSECONDS as a plain LONG. Fixture generations have written
    * the column as either parquet TIMESTAMP(NANOS) (read as a nanos long
    * via `nanosAsLong` in old Spark configs) or timestamp[us]
    * (TIMESTAMP_NTZ); every downstream site does integral arithmetic on
    * nanos (`ts div 1000`, `ts div 86400000000000`, bucket modulo), so the
    * source layer owns the physical-type seam. `unix_micros * 1000` is
    * exact — no double detour, no sub-micro loss (micros fixtures carry
    * zero sub-micro component by construction).
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** Rewrite a timestamp-typed `ts` column to epoch-nanos long; a frame
    * already carrying a long `ts` (old fixtures, synthetic test frames)
    * passes through untouched. Column order is preserved.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
          Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case _ => df
    }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}

/** Row-index discipline (SURVEY §1.4): pandas carries a first-class row
  * index; Spark has none. Where an operator's contract depends on input
  * order (reassembly order, rolling windows over "the sequence"), we
  * materialize an explicit index column.
  *
  * `monotonically_increasing_id` is (partitionId << 33) + offset: it is
  * strictly increasing in (partition, offset) order, so sorting by it
  * restores the source row order without a global zipWithIndex job —
  * O(0) extra passes, cluster-safe. Dense 0..n-1 ranks (true pandas
  * RangeIndex) are only needed when the index value itself is user
  * visible; `dense` provides that at the cost of one window sort.
  */
object Index {
  val col = "__index__"

  def attach(df: DataFrame): DataFrame =
    df.withColumn(col, monotonically_increasing_id())

  /** Dense 0..n-1 index. Requires a global sort — use only when index
    * values are observable (e.g., pandas-facade `.index`).
    */
  def dense(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    attach(df).withColumn(
      col,
      row_number().over(Window.orderBy(org.apache.spark.sql.functions.col(col))) - 1L)
  }

  def strip(df: DataFrame): DataFrame = df.drop(col)

  /** Order-restoring sort — the reassembly contract (pd.concat in worker
    * order, reference core.py:269-295, dataframe.py:45-51).
    */
  def restore(df: DataFrame): DataFrame =
    df.orderBy(org.apache.spark.sql.functions.col(col))
}
