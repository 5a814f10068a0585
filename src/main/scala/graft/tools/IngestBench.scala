package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}

import graft.streaming.{EmbedIngest, NearDupIngest}
import graft.Tables

/** Dev A/B harness for the streaming-ingest hot loop: times EVERY
  * micro-batch individually (fresh index dir), so per-batch cost
  * growth with corpus size is visible — the number StreamBench's
  * aggregate rows/s hides. Uses only the public ingestBatch API, so it
  * compiles (and measures the same protocol) on any revision.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("GRAFT_INGEST_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-ingestbench").toString

    def series(name: String, rows: Long)(batch: (Int, String) => Unit): Unit = {
      // warm: 3 throwaway batches into a scratch dir (plan-shape JIT)
      (0 to 2).foreach(i => batch(i, s"$work/warm-$name"))
      val t0 = System.nanoTime()
      val per = (0 until nBatches).map { i =>
        val b0 = System.nanoTime()
        batch(i, s"$work/$name")
        (System.nanoTime() - b0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"$name%s rows/s=${rows / total}%.1f total=$total%.2f s " +
        per.map(s => f"$s%.2f").mkString("per-batch=[", ",", "]"))
    }

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    val nDocs = docs.count()
    series("neardup", nDocs) { (i, dir) =>
      NearDupIngest.ingestBatch(
        docs.where(F.col("doc_id") % nBatches === i),
        dir, "text", "doc_id", i.toLong)
    }
    docs.unpersist()

    val embs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    val nEmbs = embs.count()
    series("embed", nEmbs) { (i, dir) =>
      EmbedIngest.ingestBatch(
        embs.where(F.col("vec_id") % nBatches === i),
        dir, "embedding", "vec_id", i.toLong)
    }
    embs.unpersist()

    val p = new org.apache.hadoop.fs.Path(work)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
