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

  test("validated join: clean keys pass, planted dup fails naming the key") {
    import graft.operators.ValidatedJoin
    val left = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "l")
    val right = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "r")
    val ok = ValidatedJoin
      .join(left, right, Seq("k"), "inner", "many_to_one")
      .as[(Long, String, Double)]
      .collect()
      .toSet
    assert(ok === Set((1L, "x", 10.0), (1L, "y", 10.0), (2L, "z", 20.0)))

    val dupRight = right.union(Seq((1L, 99.0)).toDF("k", "r"))
    val e = intercept[Exception] {
      ValidatedJoin
        .join(left, dupRight, Seq("k"), "inner", "many_to_one")
        .collect()
    }
    assert(e.getMessage.contains("duplicate key"))
    // one_to_one additionally rejects the left side's duplicate
    val e2 = intercept[Exception] {
      ValidatedJoin.join(left, right, Seq("k"), "inner", "one_to_one").collect()
    }
    assert(e2.getMessage.contains("left side has duplicate"))
    intercept[IllegalArgumentException] {
      ValidatedJoin.join(left, right, Seq("k"), "inner", "one_to_n")
    }
  }
}
