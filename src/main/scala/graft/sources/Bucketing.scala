package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * A fact-fact join at 100 TB pays a full shuffle of both sides every
  * run. Writing both tables bucketed (and sorted) by the join key moves
  * that shuffle to write time, once: subsequent joins on the bucket key
  * plan as exchange-free sort-merge joins (Spark matches bucket specs
  * and skips the Exchange). The classic trade for repeatedly-joined
  * fact tables in a curation pipeline.
  *
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted managed table.
    * Drops any prior table AND its orphaned location first — a fresh
    * in-memory metastore doesn't know about files a previous session
    * left in the warehouse, and Spark refuses to reuse the directory.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new java.net.URI(s"$warehouse/$table")
    val path = new org.apache.hadoop.fs.Path(loc)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
