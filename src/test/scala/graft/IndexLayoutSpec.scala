package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Output-layout contract for the index writers (opt guide §6,
  * round 17): leg/fold parquet targets 128 MiB row groups — explicit
  * in [[Session.builder]] — and the written files must reflect it.
  * At test scale every leg is far below the target, so the checkable
  * invariant is NO FRAGMENTATION: exactly one row group per part
  * file (a mis-set or regressed block size shows up as several tiny
  * groups), with the effective writer-side target inside the guide's
  * 128 MB–1 GB range.
  */
class IndexLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SQ index + append legs: one row group per sub-target part file; block-size target in range") {
    val conf = spark.sparkContext.hadoopConfiguration
    // effective target: the explicit engine setting, or parquet's own
    // default (also 128 MiB) on a bare test session
    val target = conf.getLong("parquet.block.size", 128L * 1024 * 1024)
    assert(
      target >= 128L * 1024 * 1024 && target <= 1024L * 1024 * 1024,
      s"row-group target $target outside the guide's 128 MB–1 GB range")
    // the ENGINE session's configured value, asserted directly — the
    // file checks below run on the bare test session and would miss a
    // typo in Session.builder's setting
    assert(
      Session.IndexRowGroupBytes >= 128L * 1024 * 1024 &&
        Session.IndexRowGroupBytes <= 1024L * 1024 * 1024,
      s"Session.IndexRowGroupBytes ${Session.IndexRowGroupBytes} outside " +
        "the guide's 128 MB–1 GB range")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-index-layout")
      .toString
    val build = (0L until 64L)
      .map(i => (i, Array.tabulate(8)(j => (i + j).toDouble % 7)))
      .toDF("id", "v")
    Similarity.sqWriteIndex(build, "v", "id", dir, sourceTag = "layout")
    val append = (64L until 96L)
      .map(i => (i, Array.tabulate(8)(j => (i * j).toDouble % 5)))
      .toDF("id", "v")
    Similarity.sqAppendIndex(append, "v", "id", dir, sourceTag = "layout")

    val files = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dir))
      .filter(p =>
        p.getFileName.toString.endsWith(".parquet") &&
          !p.toString.contains("_meta"))
      .toArray
      .map(_.toString)
    assert(files.nonEmpty, s"no parquet part files written under $dir")
    files.foreach { f =>
      val size = java.nio.file.Files.size(java.nio.file.Paths.get(f))
      assert(
        size < target,
        s"$f is $size bytes — test fixture unexpectedly exceeds the " +
          "row-group target; the 1-group assertion below is then vacuous")
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val groups = reader.getFooter.getBlocks.size()
        assert(
          groups == 1,
          s"$f holds $groups row groups for a sub-target file — the " +
            "writer is fragmenting below the 128 MiB row-group contract")
      } finally reader.close()
    }
  }
}
