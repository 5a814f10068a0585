package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for training-data pipelines (extension set —
  * the reference has none; `drop_duplicates` is plain pandas outside
  * pandarallel's surface).
  *
  * Scale design notes (the point of each variant):
  *  - [[exact]]: hash-groupBy on a digest of the content — one shuffle of
  *    (digest, id) pairs, never the full text. Partial aggregation means
  *    the exchange carries one row per distinct digest per partition.
  *  - [[minHashNearDup]]: shingles → k minhashes → bands; candidate pairs
  *    come from a self-join on (band, band-signature) buckets, which is a
  *    hash-partition equi-join — the O(n²) cross product never happens.
  *    Verification (exact Jaccard) runs only on bucket collisions.
  *  - [[simHashNearDup]]: 64-bit SimHash over token hashes; near-dups =
  *    equal signatures (or banded sub-signatures for Hamming-distance>0).
  *  - [[ngramJaccardPairs]]: exact n-gram Jaccard, blocked by a cheap key
  *    to bound the pair space (blocking is the only thing that makes
  *    exact pairwise feasible at scale).
  *  - [[embeddingNearDup]]: cosine near-dup via hyperplane-LSH buckets.
  *
  * All signatures are deterministic expressions (seeded hashes, no RNG),
  * so results are reproducible run-to-run and cluster-size-independent.
  */
object Dedup {

  /** Exact dedup: group by content digest; keep the smallest id as the
    * canonical representative. Returns (h, keep_id, n).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** MinHash signature: k independent minimums over shingle hashes.
    * hash_i(s) = xxhash64(s, seed=i) — deterministic, computed in one
    * codegen'd projection.
    */
  def minHashSignature(text: Column, shingleLen: Int, k: Int): Column = {
    val sh = TextFunctions.shingles(text, shingleLen)
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))
    }: _*)
  }

  /** MinHash + LSH banding near-dup candidate pairs with exact-Jaccard
    * verification.
    *
    * @param numHashes  k minhash functions (signature length)
    * @param bands      LSH bands; rows-per-band = k/bands. Collision in
    *                   any band → candidate pair.
    * @param threshold  exact shingle-Jaccard cutoff for verified pairs
    * @return (id_a, id_b, jaccard) with id_a < id_b, distinct pairs
    */
  def minHashNearDup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleLen: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df.select(
      col(idCol).as("id"),
      TextFunctions.shingles(col(textCol), shingleLen).as("sh"),
      minHashSignature(col(textCol), shingleLen, numHashes).as("mh"))

    // band key = hash of the band's slice of the signature. The band join
    // carries ONLY (bucket, id) — shingle arrays would multiply the
    // shuffle by numHashes/bands; they are joined back just for the
    // surviving candidate pairs.
    val banded = sig
      .select(
        col("id"),
        explode(
          array((0 until bands).map { b =>
            hash(lit(b), slice(col("mh"), b * rows + 1, rows)).as(s"b$b")
          }: _*)).as("bucket"))

    val cand = banded
      .join(banded.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .distinct()

    // verify candidates with exact Jaccard over shingle sets
    val shA = sig.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = sig.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(array_union(col("sh_a"), col("sh_b")))
    cand
      .join(shA, Seq("id_a"))
      .join(shB, Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (inter.cast("double") / union).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of whitespace tokens: bit j of the result is the
    * sign of sum over tokens of (bit j of xxhash64(token) ? +1 : -1).
    */
  def simHash(text: Column): Column = {
    val tokenHashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val votes = aggregate(
        tokenHashes,
        lit(0L),
        (acc, h) =>
          acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L))
      when(votes > 0, lit(BigInt(1).<<(j).toLong)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup groups: docs sharing an identical 64-bit simhash.
    * (For Hamming distance > 0, band the signature like MinHash-LSH.)
    */
  def simHashNearDup(
      df: DataFrame,
      textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
      .groupBy("sig")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n"))
      .where(col("n") > 1)

  /** Exact n-gram Jaccard over candidate pairs produced by equi-joining
    * on a blocking key (default: identical token count). Exact and
    * shuffle-bounded: pair space = sum over blocks of |block|².
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      blockKey: Option[Column] = None,
      threshold: Double = 0.0): DataFrame = {
    val blk = blockKey.getOrElse(TextFunctions.tokenCount(col(textCol)))
    val prep = df.select(
      col(idCol).as("id"),
      blk.as("blk"),
      TextFunctions.shingles(col(textCol), n).as("sh"))
    val l = prep.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = prep.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(array_union(col("sh_a"), col("sh_b")))
    l.join(r, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (inter.cast("double") / union).as("jaccard"))
      .where(col("jaccard") > threshold)
  }

  /** Embedding cosine near-dup via hyperplane-LSH bucketing: vectors in
    * the same signature bucket are verified with exact cosine.
    * Recall is tunable via nBits (fewer bits → bigger buckets).
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nBits: Int = 12,
      threshold: Double = 0.95): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"),
      col(vecCol).as("v"),
      VectorFunctions.hyperplaneSignature(col(vecCol), nBits).as("sig"))
    val l = sig.select(col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val r = sig.select(col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("sig"))
      .where(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        VectorFunctions.cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
