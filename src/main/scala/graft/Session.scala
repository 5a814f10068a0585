package graft

import org.apache.spark.sql.SparkSession

/** Engine session facade — the analog of `pandarallel.initialize()`
  * (reference: pandarallel/core.py:451-556).
  *
  * The reference's knobs map onto Spark session config:
  *  - `nb_workers` (core.py:36, default = physical cores) → `local[n]`
  *    master threads + `spark.sql.shuffle.partitions`;
  *  - `use_memory_fs` / `shm_size_mb` transport (core.py:462-475) →
  *    obsolete: Spark owns transport (Tungsten UnsafeRow + Netty shuffle);
  *  - `progress_bar` → [[graft.progress.Progress]] accumulators.
  *
  * Scale notes (cluster posture, tested on local[n]):
  *  - AQE on: runtime shuffle-partition coalescing, skew-join splitting.
  *  - shuffle.partitions defaults to the local core count here; on a real
  *    cluster set it ~2-3x total executor cores (or rely on AQE).
  */
object Session {
  def builder(nbWorkers: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$nbWorkers]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", nbWorkers.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // dims/signature tables up to 64 MB go broadcast instead of SMJ —
      // with 100+ GB executors this trades trivial memory for removing
      // fact-side shuffles (AQE still decides per-join at runtime)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts is parquet TIMESTAMP(NANOS); Spark 4 has no
      // nanos timestamp type — read as long (nanos since epoch).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Stage.materializeOnce takes the reliable-checkpoint path on a
      // cluster with a checkpoint dir; those files are never deleted
      // unless the cleaner tracks them — without this the checkpoint
      // store grows by every staged frame for the app's lifetime
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")

  /** Build (or reuse) the engine session. */
  def initialize(nbWorkers: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession = {
    val spark = builder(nbWorkers).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
