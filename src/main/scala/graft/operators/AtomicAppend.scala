package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.SnapshotCommit

/** Crash-atomic append protocol for the monolithic parquet indexes
  * (SQ / LSH / IVF corpora, BM25 postings) — the batch-index twin of
  * the streaming trees' marker-published segments
  * ([[graft.streaming.SegmentCompaction]]) and [[SnapshotCommit]]'s
  * staged-rename snapshots, closing the one durability gap the
  * index-evolution family had: a bare `.mode("append").parquet(path)`
  * that dies mid-write leaves orphan part files that every later read
  * silently includes (or chokes on), with no rebuild protocol.
  *
  * Layout: the BUILD's files stay exactly where they were (`dataRoot`
  * root files, or its partition directories) — zero migration, and a
  * pre-protocol index is simply an index with no segments. Each APPEND
  * becomes one `dataRoot/_seg-<n>` directory, written first into
  * `dataRoot/_staging-<n>` and then published by rename + zero-byte
  * marker ([[SnapshotCommit.publish]] — rename alone is not atomic on
  * object stores). The underscore prefix makes both staging and
  * segment directories INVISIBLE to a plain parquet read of
  * `dataRoot` (Spark's file index skips `_`/`.`-prefixed paths — the
  * same convention that already hides every index's `_meta`), so no
  * reader, including one that predates this protocol, can ever
  * observe a half-written batch. Committed readers use [[read]]:
  * base ∪ marked segments, each leg its own scan root so partition
  * discovery and pruning work per leg unchanged.
  *
  * Crash windows, all closed: mid-write leaves `_staging-<n>`
  * (hidden; deleted and rewritten by the next append, which computes
  * the same next id); mid-rename on a copy+delete store leaves a
  * partial UNMARKED `_seg-<n>` (hidden from [[read]]; replaced by the
  * next publish); between rename and marker likewise. Committed ids
  * are a contiguous 1..k (single-writer, same contract as every
  * append path), so `next = committedMax + 1` both repairs and never
  * collides with a committed segment.
  *
  * Compaction = rebuild: `writeIndex(read(...), path)` folds the
  * segments back into the base — appends are incremental maintenance,
  * not a log that must grow forever.
  */
object AtomicAppend {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Numeric id of a `_seg-<n>` directory name. */
  private def segId(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("_seg-") && n.length > 5 && n.drop(5).forall(_.isDigit))
      Some(n.drop(5).toLong)
    else None
  }

  /** Committed (marker-bearing) segment directories under `dataRoot`,
    * in id order.
    */
  def committedSegs(spark: SparkSession, dataRoot: String): Seq[Path] = {
    val root = new Path(dataRoot)
    val fs = fsFor(spark, root)
    if (!fs.exists(root)) Nil
    else
      fs.listStatus(root)
        .iterator
        .filter(s =>
          s.isDirectory && segId(s.getPath).isDefined &&
            SnapshotCommit.isCommitted(fs, s.getPath))
        .map(_.getPath)
        .toSeq
        .sortBy(p => segId(p).get)
  }

  /** True iff `dir` holds at least one data file: a non-hidden file
    * with no hidden path component below `dir` (a segment's own
    * `_meta` or the commit marker are not data). Guards [[read]]
    * against schema inference over marker-only directories and lets
    * [[publish]] turn an empty batch into a no-op.
    */
  private def hasData(fs: FileSystem, dir: Path): Boolean = {
    val rootStr = dir.toUri.getPath
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(rootStr).stripPrefix("/")
      if (rel.nonEmpty &&
          rel.split('/').forall(c => !c.startsWith("_") && !c.startsWith(".")))
        return true
    }
    false
  }

  /** Run `write` against a staging directory, then publish it as the
    * next committed segment of `dataRoot`. `write` receives the
    * staging path and must leave a complete parquet dataset there
    * (mode `overwrite`; any partitioning). An empty batch (no data
    * files staged) is a no-op — nothing is published — unless
    * `keepIfMetaOnly` and the stage carries hidden metadata (BM25's
    * zero-token docs stage no posting rows but still move the corpus
    * doc count, which lives in the segment's `_meta`).
    */
  def publish(
      spark: SparkSession,
      dataRoot: String,
      keepIfMetaOnly: Boolean = false)(write: String => Unit): Unit = {
    val root = new Path(dataRoot)
    val fs = fsFor(spark, root)
    val next =
      committedSegs(spark, dataRoot).flatMap(segId).lastOption.getOrElse(0L) + 1
    val staging = new Path(root, s"_staging-$next")
    if (fs.exists(staging)) fs.delete(staging, true) // crashed prior attempt
    write(staging.toString)
    if (hasData(fs, staging) ||
        (keepIfMetaOnly && fs.listFiles(staging, true).hasNext))
      SnapshotCommit.publish(fs, staging, new Path(root, s"_seg-$next"))
    else fs.delete(staging, true)
  }

  /** The committed view of an appendable index: the base build's files
    * plus every marked segment, one scan root per leg (partition
    * discovery and pruning apply per leg; a filter on the union pushes
    * into each scan). A never-appended index is exactly the base read.
    */
  def read(spark: SparkSession, dataRoot: String): DataFrame = {
    val root = new Path(dataRoot)
    val fs = fsFor(spark, root)
    committedSegs(spark, dataRoot)
      .filter(hasData(fs, _))
      .foldLeft(spark.read.parquet(dataRoot))((d, s) =>
        d.unionByName(spark.read.parquet(s.toString)))
  }

  /** [[read]] with provenance: a `__seg` column labels each row 0 for
    * the base build and the segment id for every committed append —
    * the per-segment view that drift metrics (quantization distortion,
    * cluster-occupancy skew) aggregate over to decide when the
    * documented retrain-=-rebuild is due. Same legs as [[read]], so
    * partition discovery/pruning per leg is unchanged; the label is a
    * plan literal per leg, not a computed column.
    */
  def readWithSeg(spark: SparkSession, dataRoot: String): DataFrame = {
    val root = new Path(dataRoot)
    val fs = fsFor(spark, root)
    import org.apache.spark.sql.functions.lit
    committedSegs(spark, dataRoot)
      .filter(hasData(fs, _))
      .foldLeft(
        spark.read.parquet(dataRoot).withColumn("__seg", lit(0L)))((d, s) =>
        d.unionByName(
          spark.read
            .parquet(s.toString)
            .withColumn("__seg", lit(segId(s).get))))
  }

  /** Path of `name` inside the LATEST committed segment that carries
    * it, else `None` — for per-append metadata that must commit
    * atomically WITH its data (BM25's merged corpus stats ride inside
    * the segment; the latest segment's copy is the current truth).
    */
  def latestSegFile(
      spark: SparkSession,
      dataRoot: String,
      name: String): Option[String] = {
    val root = new Path(dataRoot)
    val fs = fsFor(spark, root)
    committedSegs(spark, dataRoot).reverseIterator
      .map(p => new Path(p, name))
      .find(fs.exists)
      .map(_.toString)
  }
}
