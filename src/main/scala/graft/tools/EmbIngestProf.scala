package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{functions => F, SparkSession}

import graft.Tables
import graft.streaming.EmbedIngest

/** Dev profiler for the micro-batch ingest fixed cost: runs
  * `nBatches` batches into a fresh temp index and prints, per batch,
  * the wall plus every Spark job inside it (with its description tag
  * when GRAFT_CACHE_DEBUG is set) — the direct view of where the
  * per-trigger fixed cost goes as the segment tree grows. First arg:
  * batch count; second arg: family (`emb` | `mh`).
  */
object EmbIngestProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = args.headOption.map(_.toInt).getOrElse(8)
    val familyArg = args.drop(1).headOption.getOrElse("emb")
    // `<family>-fb` profiles the forced-DISTRIBUTED (unfused) shape —
    // the over-cap fallback that IS the 100-TB path (the StreamBench
    // neardup_ingest_fallback component)
    val family = familyArg.stripSuffix("-fb")
    if (familyArg.endsWith("-fb"))
      sys.props(graft.operators.Dedup.ForceUnfusedProp) = "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work =
      java.nio.file.Files.createTempDirectory("graft-embprof").toString
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").cache()
    embs.count()

    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(
          j.jobId,
          (
            System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
          lines.add(
            f"    job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $desc")
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        lines.add(
          f"      stage ${si.stageId}%3d tasks=${si.numTasks}%3d  " +
            si.rddInfos.sortBy(_.id).map(_.name).mkString(">").take(120))
      }
    })

    val docs =
      if (family == "mh")
        graft.Tables.documents(spark, sfDir).select("doc_id", "text").cache()
      else null
    if (docs != null) docs.count()

    def ingest(b: org.apache.spark.sql.DataFrame, dir: String, id: Long): Unit =
      if (family == "mh")
        graft.streaming.NearDupIngest.ingestBatch(b, dir, "text", "doc_id", id)
      else EmbedIngest.ingestBatch(b, dir, "embedding", "vec_id", id)

    // warm: 3 batches into a scratch index (the three plan shapes)
    val warm =
      (if (family == "mh") docs else embs).limit(64).cache()
    warm.count()
    (0 until 3).foreach(i => ingest(warm, s"$work/warm", i.toLong))
    warm.unpersist()
    lines.clear()

    (0 until nBatches).foreach { i =>
      val b =
        if (family == "mh") docs.where(F.col("doc_id") % nBatches === i)
        else embs.where(F.col("vec_id") % nBatches === i)
      val t0 = System.nanoTime()
      ingest(b, s"$work/idx", i.toLong)
      val wall = (System.nanoTime() - t0) / 1e3 / 1e3
      Thread.sleep(200) // let the listener bus drain
      println(f"batch $i%2d wall $wall%7.1f ms")
      lines.forEach(println(_))
      lines.clear()
    }
    spark.stop()
  }
}
