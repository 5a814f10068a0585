package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{EmbedIngest, NearDupIngest}

/** Dev profiler for the streaming ingest hot loop: times each
  * micro-batch of the MinHash and embedding ingest paths separately,
  * so the phase that dominates (signing, intra-batch components,
  * corpus probe, segment write) shows up as batch-over-batch growth
  * (probe cost grows with the index) vs flat cost (signing).
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("graft-ingestprof").toString

    // per-batch Spark job counter — each job is ~0.1-0.5 s of fixed
    // scheduling latency at micro-batch sizes, so the job count IS the
    // overhead profile
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    val n = docs.count()
    println(s"docs=$n batches=$nBatches")
    (0 until nBatches).foreach { i =>
      val b = docs.where(col("doc_id") % nBatches === i)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      NearDupIngest.ingestBatch(b, s"$work/mh", "text", "doc_id", i.toLong)
      println(f"neardup batch $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"jobs=${jobs.get() - j0}")
    }
    val embs =
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    val ne = embs.count()
    println(s"embs=$ne")
    (0 until nBatches).foreach { i =>
      val b = embs.where(col("vec_id") % nBatches === i)
      val t0 = System.nanoTime()
      EmbedIngest.ingestBatch(b, s"$work/emb", "embedding", "vec_id", i.toLong)
      println(f"embed batch $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val p = new org.apache.hadoop.fs.Path(work)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
