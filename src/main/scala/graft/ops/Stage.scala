package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager one-time materialization of an intermediate frame that feeds
  * multiple downstream jobs (signature indexes, self-join prep, two-pass
  * window protocols). Without it the whole upstream pipeline re-executes
  * once per consumer.
  *
  * Mechanism by deployment:
  *  - reliable `checkpoint()` when the context has a checkpoint dir and
  *    is NOT local: blocks live in the checkpoint store (HDFS/object
  *    store), so losing an executor loses nothing — the posture for a
  *    real cluster, where `localCheckpoint`'s truncated lineage makes a
  *    lost executor's blocks unrecoverable and fails the job.
  *  - `localCheckpoint()` otherwise: eager, MEMORY_AND_DISK on the
  *    executors, and blocks are freed by the ContextCleaner when the
  *    frame is GC'd. (A plain `persist` would pin the frame in the
  *    CacheManager until an explicit unpersist that no caller can issue
  *    — the returned frame still reads the persisted blocks lazily.)
  *    In `local[*]` there are no executors to lose, so the reliability
  *    trade is free. On a cluster WITHOUT a checkpoint dir this keeps
  *    the localCheckpoint behavior: fast, but an executor loss aborts
  *    the job — set `spark.sparkContext.setCheckpointDir(...)` to buy
  *    fault tolerance for long pipelines.
  */
object Stage {
  /** LAZY plan re-rooting — the codegen-stability half of
    * [[materializeOnce]] without the eager job. The returned frame's
    * plan starts at a LogicalRDD over the input's Row RDD, so every
    * DOWNSTREAM stage's generated source is identical no matter what
    * per-batch literals (offset ranges, modulo filters) the input plan
    * embeds — the codegen cache actually caches. Unlike
    * materializeOnce, nothing executes here and nothing is pinned in
    * the block manager: the input pipeline runs when (and as often as)
    * the result is consumed. Use it when exactly ONE downstream
    * materialization will consume the frame — the micro-batch ingest
    * signing pass — where an eager checkpoint of the raw batch would
    * just be a second full pass.
    */
  def rerootLazy(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** LAZY compute-once: the frame's Row RDD is persisted
    * (MEMORY_AND_DISK) but nothing executes now — the FIRST consumer
    * materializes the blocks inside its own job and every later
    * consumer reads them. Same multiple-consumer economics as
    * [[materializeOnce]] without the dedicated eager job, which on a
    * micro-batch is a full scheduler round trip for a few hundred
    * rows. Blocks are freed by the ContextCleaner once the frame is
    * unreachable. Prefer [[materializeOnce]] when the first consumer
    * must not bear the compute (e.g. a time-sensitive first probe) or
    * on a cluster with a checkpoint dir (reliability trade — see
    * class doc); this is the micro-batch ingest shape.
    */
  def materializeLazy(df: DataFrame): DataFrame = {
    val rdd = df.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.sparkSession.createDataFrame(rdd, df.schema)
  }

  def materializeOnce(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined && !sc.isLocal) {
      // NOTE: reliable checkpoints are NOT auto-deleted by default —
      // without `spark.cleaner.referenceTracking.cleanCheckpoints=true`
      // (a context-CREATION-time setting; Session.builder sets it)
      // every materializeOnce call leaves a full frame copy in the
      // checkpoint store for the application's lifetime. Sessions built
      // elsewhere must set that flag themselves or own the cleanup.
      // persist BEFORE the eager checkpoint: Dataset.checkpoint runs a
      // count job and then the ReliableCheckpointRDD write job — without
      // a cache the upstream pipeline (the global sort / signature prep
      // this helper exists to run ONCE) would execute twice. The write
      // reads the cached blocks; afterwards the checkpointed frame is
      // backed by the checkpoint store, so the cache can be dropped.
      val cached = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try cached.checkpoint()
      finally cached.unpersist(blocking = false)
    } else df.localCheckpoint()
  }
}
