package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Dedup

/** Dev-only instrumentation main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, d).repartition(32)
    val t0 = System.nanoTime()
    val out = Dedup.minHashNearDup(docs, "text", "doc_id",
      shingleLen = 4, numHashes = 32, bands = 8, threshold = 0.4)
    out.write.format("noop").mode("overwrite").save()
    println(f"[scratch] q14 end-to-end ${(System.nanoTime - t0) / 1e9}%.2f s")
    println("rows=" + out.count())
    spark.stop()
  }
}
