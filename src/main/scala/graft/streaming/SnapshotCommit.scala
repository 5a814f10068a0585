package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared snapshot commit protocol for the foreachBatch-state family
  * ([[CdcUpsert]], [[MatView]]): staged directory → rename → zero-byte
  * commit marker.
  *
  * A bare `fs.rename(dir)` is atomic on the local FS and HDFS but NOT
  * on S3A and most object stores, where directory "rename" is
  * copy+delete — a crash mid-rename can publish a partial `snap=<id>`
  * that a naive reader would treat as committed. The marker closes that
  * hole without assuming rename atomicity: a snapshot is committed IFF
  * its directory contains [[Marker]], which is a single-file create
  * (atomic-visibility on every store). Readers honor only marked
  * snapshots; a writer retrying a batch treats an unmarked target as a
  * crashed partial attempt and rebuilds it. Single-writer per table
  * (the Structured Streaming foreachBatch contract) — this is a crash
  * protocol, not a concurrency protocol.
  */
object SnapshotCommit {

  val Marker = "_GRAFT_COMMITTED"

  /** True iff `snapDir` is a committed snapshot (marker present). */
  def isCommitted(fs: FileSystem, snapDir: Path): Boolean =
    fs.exists(new Path(snapDir, Marker))

  /** Publish `staging` as `target`: rename, then create the marker.
    * A pre-existing UNMARKED target (crash between rename and marker,
    * or a partial object-store rename) is deleted and replaced.
    */
  def publish(fs: FileSystem, staging: Path, target: Path): Unit = {
    if (fs.exists(target)) fs.delete(target, true) // crashed partial
    fs.mkdirs(target.getParent) // rename needs the parent to exist
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"failed to publish snapshot: rename $staging -> $target")
    fs.create(new Path(target, Marker), true).close()
  }

  /** (id, path) of every COMMITTED `snap=<id>` under `root`. */
  def committed(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Nil
    else
      fs.listStatus(root)
        .iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap="))
        .flatMap { s =>
          val n = s.getPath.getName.stripPrefix("snap=")
          if (n.nonEmpty && n.forall(_.isDigit) && isCommitted(fs, s.getPath))
            Some((n.toLong, s.getPath))
          else None
        }
        .toSeq
}
