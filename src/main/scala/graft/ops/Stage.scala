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
