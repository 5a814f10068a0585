package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

/** MERGE semantics on planted change batches: latest-version-wins
  * within a batch, deletes remove, inserts append, untouched rows pass
  * through — and none of it depends on partitioning.
  */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")

  test("merge: update, delete, insert, multi-change latest-wins") {
    // k=1: two updates in one batch — version 3 must win over 2
    // k=2: delete
    // k=9: brand-new key (insert)
    // k=3: untouched
    val changes = Seq(
      (1L, "a", 11.0, 2L, false),
      (1L, "a", 12.0, 3L, false),
      (2L, "b", 0.0, 2L, true),
      (9L, "z", 90.0, 2L, false))
      .toDF("k", "tag", "v", "version", "deleted")
    for (parts <- Seq(1, 5)) {
      val got = Upsert
        .merge(snap.repartition(parts), changes.repartition(parts),
          Seq("k"), "version", "deleted")
        .as[(Long, String, Double)]
        .collect()
        .toSet
      assert(got === Set((1L, "a", 12.0), (3L, "c", 30.0), (9L, "z", 90.0)),
        s"parts=$parts")
    }
  }

  test("merge: same-version duplicate changes resolve deterministically") {
    // two rows for k=1 with the SAME version — the remaining-columns-desc
    // tie-break must pick the same survivor under any partitioning
    val changes = Seq(
      (1L, "a", 11.0, 2L, false),
      (1L, "a", 17.0, 2L, false))
      .toDF("k", "tag", "v", "version", "deleted")
    val results = Seq(1, 7).map { parts =>
      Upsert
        .merge(snap, changes.repartition(parts), Seq("k"), "version", "deleted")
        .where($"k" === 1L)
        .as[(Long, String, Double)]
        .collect()
        .toSeq
    }
    assert(results(0) === results(1))
    assert(results(0) === Seq((1L, "a", 17.0))) // desc tie-break: 17 > 11
  }

  test("merge: result schema is exactly the snapshot schema") {
    val changes = Seq((1L, "a", 11.0, 2L, false))
      .toDF("k", "tag", "v", "version", "deleted")
    val out = Upsert.merge(snap, changes, Seq("k"), "version", "deleted")
    assert(out.columns.toSeq === snap.columns.toSeq)
  }

  test("merge: missing change columns fail loudly") {
    val bad = Seq((1L, 11.0, 2L, false)).toDF("k", "v", "version", "deleted")
    intercept[IllegalArgumentException] {
      Upsert.merge(snap, bad, Seq("k"), "version", "deleted")
    }
  }
}
