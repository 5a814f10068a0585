package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AtomicAppend, ProductQuant, Sampling, Similarity}
import graft.streaming.SnapshotCommit

/** Crash simulations for the monolithic index appends (SQ / LSH / IVF
  * / BM25 on [[AtomicAppend]]): every test plants a POISONED append —
  * a batch that would hijack the probe's top ranks if any reader
  * honored it — then simulates a crash at the worst window (rename
  * done, marker missing) by deleting the segment's commit marker, and
  * asserts (1) probes are bit-identical to the pre-append index, (2)
  * the next real append REPAIRS the crash (replaces the orphan) and
  * lands probes bit-identical to a one-shot rebuild, with the
  * poisoned rows gone. A leftover `_staging-*` from a mid-write crash
  * is also planted and must be swept.
  */
class AtomicAppendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs =
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)

  private def uncommit(dataRoot: String): Unit = {
    val seg = new Path(s"$dataRoot/_seg-1")
    assert(fs.exists(seg), s"expected a published segment at $seg")
    assert(fs.delete(new Path(seg, SnapshotCommit.Marker), false))
  }

  private def plantStagingJunk(dataRoot: String): Unit = {
    val junk = new Path(s"$dataRoot/_staging-1/part-junk.parquet")
    fs.mkdirs(junk.getParent)
    val out = fs.create(junk, true)
    out.write(Array[Byte](1, 2, 3)) // truncated garbage, not parquet
    out.close()
  }

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private lazy val evens = emb.where(pmod(col("vec_id"), lit(2)) === 0)
  private lazy val odds = emb.where(pmod(col("vec_id"), lit(2)) === 1)
  private lazy val qVec = emb
    .where(col("vec_id") === 2) // an even id: present in every base build
    .select(col("embedding").cast("array<double>"))
    .head()
    .getSeq[Double](0)
  // the poison: the query vector itself under a fresh id — cosine 1.0,
  // rank 1 in any probe that honors the crashed segment
  private def poison = Seq((999999L, qVec)).toDF("vec_id", "embedding")

  test("SQ: crashed append invisible, repair == rebuild") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-atomic-sq").toString
    val idx = s"$base/idx"
    Similarity.sqWriteIndex(evens, "embedding", "vec_id", idx, sourceTag = "s")
    def probe(p: String) = Similarity
      .sqProbeIndex(spark, p, qVec, k = 10, sourceTag = "s")
      .collect().map(r => (r.getLong(0), r.getAs[Double]("sim"))).toSeq
    val before = probe(idx)
    Similarity.sqAppendIndex(poison, "embedding", "vec_id", idx, sourceTag = "s")
    uncommit(idx)
    plantStagingJunk(idx)
    assert(probe(idx) === before, "unmarked segment leaked into the probe")
    Similarity.sqAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    val rebuilt = s"$base/rebuilt"
    Similarity.sqWriteIndex(emb, "embedding", "vec_id", rebuilt, sourceTag = "s")
    val repaired = probe(idx)
    assert(!repaired.exists(_._1 == 999999L), "poisoned batch survived repair")
    assert(repaired === probe(rebuilt))
    assert(AtomicAppend.committedSegs(spark, idx).size === 1)
  }

  test("LSH: crashed append invisible, repair == rebuild") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-atomic-lsh").toString
    val idx = s"$base/idx"
    Similarity.lshWriteIndex(evens, "embedding", "vec_id", idx, sourceTag = "s")
    def probe(p: String) = Similarity
      .lshProbeIndex(spark, p, qVec, k = 10, sourceTag = "s")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = probe(idx)
    Similarity.lshAppendIndex(poison, "embedding", "vec_id", idx, sourceTag = "s")
    uncommit(idx)
    plantStagingJunk(idx)
    assert(probe(idx) === before, "unmarked segment leaked into the probe")
    Similarity.lshAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    val rebuilt = s"$base/rebuilt"
    Similarity.lshWriteIndex(emb, "embedding", "vec_id", rebuilt, sourceTag = "s")
    val repaired = probe(idx)
    assert(!repaired.exists(_._1 == 999999L), "poisoned batch survived repair")
    assert(repaired === probe(rebuilt))
  }

  test("IVF: crashed append invisible, repair searches the real batch") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-atomic-ivf").toString
    val idx = s"$base/idx"
    Similarity.ivfWriteIndexKmeans(
      evens, "embedding", "vec_id", idx, k = 8, iters = 2, sourceTag = "s")
    // nprobe = k = 8 probes every cell → the probe IS brute force over
    // whatever corpus the reader honors; poison visible ⇒ rank 1
    def probe() = Similarity
      .ivfProbeIndex(spark, idx, qVec, k = 10, nprobe = 8, sourceTag = "s")
      .collect().map(_.getAs[Long]("id")).toSeq
    val before = probe()
    Similarity.ivfAppendIndex(poison, "embedding", "vec_id", idx, sourceTag = "s")
    uncommit(s"$idx/corpus")
    plantStagingJunk(s"$idx/corpus")
    assert(probe() === before, "unmarked segment leaked into the probe")
    Similarity.ivfAppendIndex(odds, "embedding", "vec_id", idx, sourceTag = "s")
    val exact = Similarity
      .bruteForceTopK(emb, "embedding", "vec_id", qVec, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    val repaired = probe()
    assert(!repaired.contains(999999L), "poisoned batch survived repair")
    assert(repaired === exact)
  }

  test("IVF-PQ: crashed append invisible, repair searches the real batch, split-shape invariant") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-atomic-ivfpq").toString
    val idx = s"$base/idx"
    ProductQuant.ivfPqWriteIndex(
      evens.drop("label"), "embedding", "vec_id", idx,
      kClusters = 4, m = 8, ksub = 16, iters = 2, sourceTag = "s")
    // nprobe = every cell and refine >= corpus: the ADC cut keeps
    // everything and the exact re-rank IS brute force over whatever
    // corpus the reader honors — poison visible ⇒ rank 1
    def probe(p: String) = ProductQuant
      .ivfPqProbe(spark, p, qVec, k = 10, nprobe = 4, refine = 1000,
        sourceTag = "s")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = probe(idx)
    ProductQuant.ivfPqAppendIndex(poison, "embedding", "vec_id", idx, "s")
    uncommit(s"$idx/corpus")
    plantStagingJunk(s"$idx/corpus")
    assert(probe(idx) === before, "unmarked segment leaked into the probe")
    ProductQuant.ivfPqAppendIndex(
      odds.drop("label"), "embedding", "vec_id", idx, "s")
    val exact = Similarity
      .bruteForceTopK(emb, "embedding", "vec_id", qVec, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    val repaired = probe(idx)
    assert(!repaired.exists(_._1 == 999999L), "poisoned batch survived repair")
    assert(repaired.map(_._1) === exact)
    assert(AtomicAppend.committedSegs(spark, s"$idx/corpus").size === 1)
    // frozen quantizers make the append SPLIT-SHAPE INVARIANT: the
    // same odd rows landed as two segments probe bitwise-identically
    // (k-means/codebook training is deterministic on the even half,
    // and codes never depend on what else is in the corpus)
    val idx2 = s"$base/idx2"
    ProductQuant.ivfPqWriteIndex(
      evens.drop("label"), "embedding", "vec_id", idx2,
      kClusters = 4, m = 8, ksub = 16, iters = 2, sourceTag = "s")
    ProductQuant.ivfPqAppendIndex(
      odds.drop("label").where(pmod(col("vec_id"), lit(4)) === 1),
      "embedding", "vec_id", idx2, "s")
    ProductQuant.ivfPqAppendIndex(
      odds.drop("label").where(pmod(col("vec_id"), lit(4)) === 3),
      "embedding", "vec_id", idx2, "s")
    assert(probe(idx2) === repaired)
    assert(AtomicAppend.committedSegs(spark, s"$idx2/corpus").size === 2)
  }

  test("BM25: crashed append invisible (postings AND stats), repair == rebuild") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val dEvens = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val dOdds = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val base = java.nio.file.Files
      .createTempDirectory("graft-atomic-bm25").toString
    val idx = s"$base/idx"
    Sampling.bm25WriteIndex(dEvens, "doc_id", "text", idx, sourceTag = "s")
    val batch = Seq(1L -> Seq("hash", "join", "stream"))
    def probe(p: String) = Sampling
      .bm25ProbeMany(spark, p, batch, k = 15, sourceTag = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = probe(idx)
    val metaBefore = Sampling.bm25ReadMeta(spark, idx)
    // poison: a doc stuffed with the query term — top bm25 if honored
    val pDoc = Seq((999999L, Seq.fill(50)("hash").mkString(" ")))
      .toDF("doc_id", "text")
    Sampling.bm25AppendIndex(pDoc, "doc_id", "text", idx, sourceTag = "s")
    uncommit(s"$idx/postings")
    plantStagingJunk(s"$idx/postings")
    assert(probe(idx) === before, "unmarked postings leaked into the probe")
    // the stats committed WITH the crashed segment must vanish with it
    val metaAfterCrash = Sampling.bm25ReadMeta(spark, idx)
    for (f <- Seq("n", "avgdl", "toks"))
      assert(metaAfterCrash.getAs[Double](f) === metaBefore.getAs[Double](f),
        s"crashed segment's $f leaked into the live stats")
    Sampling.bm25AppendIndex(dOdds, "doc_id", "text", idx, sourceTag = "s")
    val rebuilt = s"$base/rebuilt"
    Sampling.bm25WriteIndex(docs, "doc_id", "text", rebuilt, sourceTag = "s")
    val repaired = probe(idx)
    assert(!repaired.exists(_._2 == 999999L), "poisoned doc survived repair")
    assert(repaired === probe(rebuilt))
    val mE = Sampling.bm25ReadMeta(spark, idx)
    val mR = Sampling.bm25ReadMeta(spark, rebuilt)
    for (f <- Seq("n", "avgdl", "toks"))
      assert(mE.getAs[Double](f) === mR.getAs[Double](f), f)
  }

  test("empty batch is a no-op; segments accumulate in id order") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-atomic-empty").toString
    val idx = s"$base/idx"
    Similarity.sqWriteIndex(evens, "embedding", "vec_id", idx, sourceTag = "s")
    Similarity.sqAppendIndex(
      emb.where(lit(false)), "embedding", "vec_id", idx, sourceTag = "s")
    assert(AtomicAppend.committedSegs(spark, idx).isEmpty)
    Similarity.sqAppendIndex(
      odds.limit(5), "embedding", "vec_id", idx, sourceTag = "s")
    Similarity.sqAppendIndex(
      odds.where(col("vec_id") >= 11).limit(5),
      "embedding", "vec_id", idx, sourceTag = "s")
    val segs = AtomicAppend.committedSegs(spark, idx)
    assert(segs.map(_.getName) === Seq("_seg-1", "_seg-2"))
    assert(
      AtomicAppend.read(spark, idx).count() === evens.count() + 10)
  }
}
