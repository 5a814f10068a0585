package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{functions => F, SparkSession}
import graft.streaming.NearDupIngest
import graft.Tables

/** Dev profiler for the micro-batch ingest hot loop: per-job wall
  * times inside one batch (deleted-at-exit temp index).
  */
object IngestProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-ingestprof").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    docs.count()
    val nBatches = 4
    val warm = docs.limit(64).cache(); warm.count()
    NearDupIngest.ingestBatch(warm, s"$work/warm", "text", "doc_id", 0L)
    NearDupIngest.ingestBatch(warm, s"$work/warm", "text", "doc_id", 1L)
    warm.unpersist()

    // instrument batch 2
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, (System.nanoTime(), ""))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, _) =>
          lines.add(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskInfo.duration > 150) {
          val m = te.taskMetrics
          lines.add(f"    task stage=${te.stageId} ${te.taskInfo.duration}%5d ms " +
            f"run=${m.executorRunTime}%5d cpu=${m.executorCpuTime / 1000000}%5d " +
            f"gc=${m.jvmGCTime}%4d srf=${m.shuffleReadMetrics.fetchWaitTime}%4d " +
            f"swt=${m.shuffleWriteMetrics.writeTime / 1000000}%4d " +
            f"inRec=${m.inputMetrics.recordsRead}%7d srRec=${m.shuffleReadMetrics.recordsRead}%7d")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (dur > 0.15)
          lines.add(f"  stage ${si.stageId}%3d $dur%6.2f s tasks=${si.numTasks} rdds=" +
            si.rddInfos.sortBy(_.id).map(r => r.name).mkString(">"))
      }
    })
    def compiles(): (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000000)
    }
    val embs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    embs.count()
    val ew = embs.limit(64).cache(); ew.count()
    (0 to 2).foreach(i => graft.streaming.EmbedIngest.ingestBatch(ew, s"$work/warm-emb", "embedding", "vec_id", i.toLong))
    ew.unpersist()
    (0 until 5).foreach { i =>
      graft.streaming.EmbedIngest.ingestBatch(
        embs.where(F.col("vec_id") % 8 === i), s"$work/emb", "embedding", "vec_id", i.toLong)
    }
    val c0 = compiles()
    lines.clear()
    val t0 = System.nanoTime()
    graft.streaming.EmbedIngest.ingestBatch(
      embs.where(F.col("vec_id") % 8 === 5), s"$work/emb", "embedding", "vec_id", 5L)
    val total = (System.nanoTime() - t0) / 1e9
    val c1 = compiles()
    println(s"COMPILES steady: ${c1._1 - c0._1} (${c1._2 - c0._2} ms)")
    Thread.sleep(500)
    lines.forEach(l => println(l))
    println(f"BATCH TOTAL $total%.2f s")
    val p = new org.apache.hadoop.fs.Path(work)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
