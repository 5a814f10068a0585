package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE / upsert — apply a change batch (upserts + deletes) to a
  * snapshot, producing the next snapshot. The relational core of a
  * table-format MERGE INTO (Delta/Iceberg) and of pandas
  * `combine_first` / `DataFrame.update`, as one deterministic operator:
  *
  *  1. the change batch is first collapsed to ONE latest row per key
  *     (greatest `versionCol`, deterministic tie-break) — a batch may
  *     carry several changes to the same key and the last must win;
  *  2. snapshot rows whose key appears in the batch are dropped
  *     (LEFT ANTI against the batch's distinct keys);
  *  3. surviving latest changes that are not deletes are unioned in.
  *
  * Scale shape: the ONLY work on the snapshot side is the anti-join.
  * With a day-sized change batch against a 100 TB snapshot the distinct
  * change-key relation is broadcast-sized (AQE picks broadcast
  * automatically below the threshold), so the snapshot is filtered
  * in place — never shuffled, never rewritten beyond the touched rows'
  * partitions in a real table format. The change side is one window
  * (partition by key) over the batch only. Nothing in this operator
  * scans the snapshot twice.
  *
  * `changes` must carry the snapshot's columns plus `versionCol` and a
  * boolean `deleteCol`; the result has exactly the snapshot's schema.
  */
object Upsert {

  def merge(
      snapshot: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCol: String,
      deleteCol: String): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val outCols = snapshot.columns.toSeq
    require(
      (outCols ++ Seq(versionCol, deleteCol)).forall(changes.columns.contains),
      s"changes must carry ${outCols.mkString(",")} + $versionCol + $deleteCol")
    // latest change per key: version desc, then every remaining column
    // desc — a total order, so the survivor is partition-count-independent
    // even if a batch carries two changes with the same version
    val ord = col(versionCol).desc +:
      changes.columns.filterNot(c => keys.contains(c) || c == versionCol)
        .toSeq.map(col(_).desc)
    val latest = changes
      .withColumn(
        "__rn",
        row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)))
      .where(col("__rn") === 1)
      .drop("__rn")
    val changedKeys = latest.select(keys.map(col): _*).distinct()
    snapshot
      .join(changedKeys, keys, "leftanti")
      .unionByName(
        // a NULL delete flag is an upsert, not a delete: the key was
        // already anti-joined out of the snapshot above, and a bare
        // !null filter would silently drop the re-insert too — the row
        // would vanish instead of being upserted
        latest
          .where(!coalesce(col(deleteCol), lit(false)))
          .select(outCols.map(col): _*))
  }
}
