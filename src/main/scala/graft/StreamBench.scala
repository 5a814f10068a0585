package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming._

/** Micro-batch throughput for the streaming components — the numbers
  * the batch bench can't see: rows/sec through each ingest-dedup
  * modality (exact fingerprints, lexical MinHash, embedding LSH), the
  * bounded-state operators (per-key HLL distinct, Misra–Gries top-k),
  * and both CDC modes (snapshot rewrite vs log-structured append).
  * State-size BOUNDS are proven by the specs (k/lgK invariants,
  * O(batch) segment sizes); this measures the cost per row so a
  * state-handling regression shows as a throughput cliff between
  * rounds.
  *
  * Each component processes a fixed load split into `nBatches`
  * micro-batches (the foreachBatch bodies are called directly for the
  * ingest/CDC paths — that is exactly what a streaming trigger
  * executes, minus source latency that would only add noise; the
  * mapGroupsWithState operators run through a real MemoryStream query
  * because their work lives inside the state store). Reported value:
  * input rows / wall seconds over all batches of the component.
  */
object StreamBench {

  /** (component -> rows/sec), deterministic component order. Cleanup is
    * unconditional: Bench catches a component failure and keeps going,
    * so without the finally a failed run would leak the cached inputs
    * and the temp index state on every bench invocation.
    */
  def run(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    val work = Files.createTempDirectory("graft-streambench").toString
    val cached =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    try runBody(spark, sfDir, work, cached)
    finally {
      cached.foreach(_.unpersist())
      val p = new org.apache.hadoop.fs.Path(work)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private def runBody(
      spark: SparkSession,
      sfDir: String,
      work: String,
      cached: scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame])
      : Seq[(String, Double)] = {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val nBatches = 4

    def timed(name: String, rows: Long)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      out += name -> (if (sec > 0) rows / sec else 0.0)
    }

    val docs = Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .cache()
    cached += docs
    val nDocs = docs.count() // also materializes the cache
    def docBatch(i: Int) = docs.where(col("doc_id") % nBatches === i)

    // Untimed warm-up — the batch-Bench methodology (one pass at small
    // scale before timing): whole-stage codegen for the signature /
    // vector expressions, broadcast machinery, and the parquet
    // writer paths all JIT on the first batch; a throwaway mini-batch
    // into a scratch index pays that once so the timed loop measures
    // steady state, which is what a long-running ingest actually runs at.
    locally {
      val warm = docs.limit(64).cache()
      warm.count()
      IngestDedup.ingestBatch(warm, s"$work/warm-exact", "text", "doc_id", 0L)
      // THREE warm batches: the ingest pipeline has three distinct
      // steady-state plan shapes (no index yet, probe-base-only, probe
      // base∪delta) and each shape Janino-compiles its stages once per
      // JVM — the third batch is the shape a long-running ingest
      // actually spends its life in, so it must warm too (measured: a
      // cold base∪delta shape costs ~20 compiles ≈ 1 s in the first
      // timed batch).
      NearDupIngest.ingestBatch(warm, s"$work/warm-mh", "text", "doc_id", 0L)
      NearDupIngest.ingestBatch(warm, s"$work/warm-mh", "text", "doc_id", 1L)
      NearDupIngest.ingestBatch(warm, s"$work/warm-mh", "text", "doc_id", 2L)
      warm.unpersist()
    }

    timed("ingest_dedup_exact", nDocs) {
      (0 until nBatches).foreach { i =>
        IngestDedup.ingestBatch(
          docBatch(i), s"$work/exact", "text", "doc_id", i.toLong)
      }
    }
    timed("neardup_ingest", nDocs) {
      (0 until nBatches).foreach { i =>
        NearDupIngest.ingestBatch(
          docBatch(i), s"$work/mh", "text", "doc_id", i.toLong)
      }
    }

    val embs = Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .cache()
    cached += embs
    val nEmbs = embs.count()
    locally {
      val warm = embs.limit(64).cache()
      warm.count()
      EmbedIngest.ingestBatch(warm, s"$work/warm-emb", "embedding", "vec_id", 0L)
      EmbedIngest.ingestBatch(warm, s"$work/warm-emb", "embedding", "vec_id", 1L)
      EmbedIngest.ingestBatch(warm, s"$work/warm-emb", "embedding", "vec_id", 2L)
      warm.unpersist()
    }
    timed("embed_ingest", nEmbs) {
      (0 until nBatches).foreach { i =>
        EmbedIngest.ingestBatch(
          embs.where(col("vec_id") % nBatches === i),
          s"$work/emb", "embedding", "vec_id", i.toLong)
      }
    }

    // CDC: the same synthetic change feed through both modes — the
    // snapshot mode pays O(table) per batch, the log mode O(batch);
    // the ratio between these two numbers is the design point.
    val cdcRows = 40000
    val changes = (0 until nBatches).map { i =>
      spark
        .range(cdcRows / nBatches)
        .select(
          (col("id") * nBatches + i).as("k"),
          concat(lit("tag"), col("id") % 7).as("tag"),
          (col("id") * 1.5).as("v"),
          lit(i.toLong).as("version"),
          lit(false).as("deleted"))
        .cache()
    }
    cached ++= changes
    changes.foreach(_.count())
    timed("cdc_upsert_snapshot", cdcRows.toLong) {
      changes.zipWithIndex.foreach { case (c, i) =>
        CdcUpsert.applyBatch(
          c, s"$work/cdc-snap", Seq("k"), "version", "deleted", i.toLong)
      }
    }
    timed("cdc_log_append", cdcRows.toLong) {
      changes.zipWithIndex.foreach { case (c, i) =>
        CdcLog.appendBatch(
          c, s"$work/cdc-log", Seq("k"), "version", "deleted", i.toLong)
      }
    }

    // mapGroupsWithState operators: real MemoryStream queries (update
    // mode), synthetic keyed loads — 16 keys, bounded token/value
    // domains so the MG/HLL state actually exercises its caps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val streamRows = 60000
    val perBatch = streamRows / nBatches

    val distinctIn = MemoryStream[(String, String)]
    val distinctQ = StreamDistinct
      .distinctStream(distinctIn.toDS().map(t =>
        StreamDistinct.KeyedValue(t._1, t._2)))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("graft_streambench_distinct")
      .start()
    try timed("stream_distinct_hll", streamRows.toLong) {
      (0 until nBatches).foreach { b =>
        distinctIn.addData((0 until perBatch).map(i =>
          (s"k${i % 16}", s"v${(b * perBatch + i) % 20000}")): _*)
        distinctQ.processAllAvailable()
      }
    } finally distinctQ.stop()

    val topkIn = MemoryStream[StreamTopK.TokenEvent]
    val topkQ = StreamTopK
      .topKStream(topkIn.toDS(), k = 64, topN = 10)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("graft_streambench_topk")
      .start()
    try timed("stream_topk_mg", streamRows.toLong) {
      (0 until nBatches).foreach { b =>
        topkIn.addData((0 until perBatch).map { i =>
          // zipf-ish: low token ids repeat often (heavy hitters exist)
          val t = (b * perBatch + i) % 977
          StreamTopK.TokenEvent(s"k${i % 16}", s"t${t * t % 977}")
        }: _*)
        topkQ.processAllAvailable()
      }
    } finally topkQ.stop()

    val cmsIn = MemoryStream[(String, String)]
    val cmsQ = graft.streaming.StreamCms
      .cmsStream(
        cmsIn.toDS().map(t => graft.streaming.StreamCms.KeyedValue(t._1, t._2)),
        probes = Seq("v0", "v17", "v999"))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("graft_streambench_cms")
      .start()
    try timed("stream_cms", streamRows.toLong) {
      (0 until nBatches).foreach { b =>
        cmsIn.addData((0 until perBatch).map(i =>
          (s"k${i % 16}", s"v${(b * perBatch + i) % 20000}")): _*)
        cmsQ.processAllAvailable()
      }
    } finally cmsQ.stop()

    out.toSeq
  }

  /** Standalone dev entry: one JSON line, same shape as the Bench
    * `"streaming"` field.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, sfDir)
    // Locale.ROOT: f"%.1f" under a comma-decimal locale breaks the JSON
    println(
      r.map { case (k, v) =>
        "\"" + k + "\":" + "%.1f".formatLocal(java.util.Locale.ROOT, v)
      }
        .mkString("{\"streaming_rows_per_sec\":{", ",", s"},\"sf\":\"$sfDir\"}"))
    spark.stop()
  }
}
