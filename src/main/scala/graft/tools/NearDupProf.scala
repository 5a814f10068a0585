package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{functions => F, SparkSession}

import graft.streaming.NearDupIngest
import graft.Tables

/** Dev profiler: per-batch job counts + wall for successive
  * NearDupIngest batches, so per-batch cost GROWTH (cache machinery,
  * plan depth, probe fan-out) is visible batch over batch.
  */
object NearDupProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("GRAFT_INGEST_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-ndprof").toString

    val jobWall = new java.util.concurrent.atomic.AtomicLong(0)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val slow = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime())
        descs.put(
          j.jobId,
          Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(starts.get(j.jobId)).foreach { t0 =>
          val ms = (System.nanoTime() - t0) / 1000000
          jobWall.addAndGet(ms)
          jobCount.incrementAndGet()
          if (ms > 60)
            slow.add(
              f"      job ${j.jobId}%4d ${ms}%5d ms [${descs.get(j.jobId)}]")
        }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo.duration > 250) {
          val m = te.taskMetrics
          slow.add(f"        task stage=${te.stageId} ${te.taskInfo.duration}%5d ms " +
            f"cpu=${m.executorCpuTime / 1000000}%5d gc=${m.jvmGCTime}%4d " +
            f"inRec=${m.inputMetrics.recordsRead}%7d " +
            f"srRec=${m.shuffleReadMetrics.recordsRead}%6d")
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur =
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (dur > 0.12)
          slow.add(f"      stage ${si.stageId}%4d $dur%5.2f s tasks=${si.numTasks} " +
            si.rddInfos.sortBy(_.id).map(_.name).mkString(">").take(400))
      }
    })
    def compiles(): (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000000)
    }
    def genCpu(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    docs.count()
    val warm = docs.limit(64).cache(); warm.count()
    (0 to 2).foreach(i =>
      NearDupIngest.ingestBatch(warm, s"$work/warm", "text", "doc_id", i.toLong))
    warm.unpersist()

    (0 until nBatches).foreach { i =>
      Thread.sleep(300) // let queued listener events drain
      jobWall.set(0); jobCount.set(0); slow.clear()
      val c0 = compiles()
      val t0 = System.nanoTime()
      NearDupIngest.ingestBatch(
        docs.where(F.col("doc_id") % nBatches === i),
        s"$work/mh", "text", "doc_id", i.toLong)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val c1 = compiles()
      println(f"batch $i%2d wall=$wall%5.2f s jobs=${jobCount.get}%3d " +
        f"jobWall=${jobWall.get / 1000.0}%5.2f s " +
        f"compiles=${c1._1 - c0._1}%3d (${c1._2 - c0._2} ms)")
      slow.forEach(l => println(l))
      spark.sparkContext.getRDDStorageInfo.foreach(r =>
        println(s"      rdd ${r.id} '${r.name}' cached=${r.numCachedPartitions}/" +
          s"${r.numPartitions} mem=${r.memSize}"))
    }

    // post-loop: raw scan costs of the persisted sig tree, with and
    // without deserializing the bh payload
    def t(name: String)(b: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = b
      println(f"scan $name ${(System.nanoTime() - t0) / 1e9}%5.2f s -> $r")
    }
    val sig = spark.read.parquet(s"$work/mh/sig")
    t("count")(sig.count())
    t("sum-size-bh")(sig.select(F.sum(F.size(F.col("bh")))).head())
    t("sum-size-bh-2")(sig.select(F.sum(F.size(F.col("bh")))).head())
    t("sum-size-mh")(sig.select(F.sum(F.size(F.col("mh")))).head())
    // raw signing cost, decoupled from the ingest machinery
    graft.functions.SignatureExpressions.register(spark)
    val norm = graft.functions.TextFunctions.normalized(F.col("text"))
    val bh = graft.functions.SignatureExpressions.shingleHashesFast(norm, 4)
    def signAll(tag: String, n: Int): Unit =
      t(s"sign-$tag")(
        docs.limit(n).coalesce(1)
          .select(
            F.col("doc_id"),
            graft.functions.SignatureExpressions
              .minHashFast(bh, 32).as("mh"))
          .select(F.sum(F.size(F.col("mh"))))
          .head())
    signAll("500", 500)
    signAll("500b", 500)
    signAll("2500", 2500)
    t("shingle-only-2500")(
      docs.limit(2500).coalesce(1)
        .select(F.sum(F.size(bh))).head())

    val p = new org.apache.hadoop.fs.Path(work)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
