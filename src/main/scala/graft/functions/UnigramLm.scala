package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (SentencePiece's model family — Kudo,
  * arXiv:1804.10959) — the other half of the tokenizer-training duopoly
  * beside [[Bpe]], same Spark-first factoring:
  *
  *   - everything trains from the WORD-FREQUENCY table, never the
  *     corpus: one corpus pass builds (word → count), and every later
  *     stage is vocab-bounded;
  *   - candidate seeding is one explode + partial+final aggregation
  *     (all substrings up to `maxPieceLen` of every distinct word,
  *     weighted by word count) with a TakeOrdered top-k — per-partition
  *     heaps + a driver merge of `seedSize` rows, no global sort
  *     materialization;
  *   - EM rounds are driver-looped like [[Bpe.trainMerges]] (round
  *     i+1's segmentations depend on round i's probabilities — the
  *     published algorithm is inherently sequential): each round is ONE
  *     distributed job — Viterbi-segment the distinct words under the
  *     current model (a UDF over the vocab-bounded frame, the
  *     [[Bpe.encodeWords]] exception), explode the used pieces
  *     weighted by word count, aggregate — plus a `seedSize`-bounded
  *     collect of the new counts. The model rides into the next round
  *     as a broadcast map, never as data-sized state.
  *
  * Determinism is engineered, not hoped for: this is HARD-EM (Viterbi
  * counts, the common simplification of Kudo's forward-backward), so
  * E-step counts are INTEGERS — Long sums that no partition order can
  * reassociate — and piece probabilities are single divisions of those
  * integers. Ties in seeding and pruning break on (count desc, piece
  * asc); ties inside Viterbi break toward the LONGER first piece
  * (fixed iteration order, strict improvement required to switch).
  * UnigramLmSpec differentials the whole trainer against a sequential
  * driver replay.
  */
object UnigramLm {

  /** Trained model: piece → log probability. Single chars seen in
    * training are always retained (coverage floor), so any training
    * word re-segments; unseen characters at encode time take
    * `unkLogp` (below every real piece).
    */
  final case class Model(logp: Map[String, Double], maxPieceLen: Int) {
    val unkLogp: Double =
      if (logp.isEmpty) -1e9 else logp.values.min - 10.0
  }

  /** (w, n): one row per distinct lowercased whitespace word — the
    * only corpus-sized pass (the [[Bpe.vocab]] contract, keeping the
    * word string for substring generation).
    */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("n"))

  /** All code-point substrings of `w` up to `maxLen`, as a column —
    * the candidate generator. `substr` counts code points, matching
    * [[Bpe.splitChars]]' non-BMP stance.
    */
  private def substrings(w: org.apache.spark.sql.Column, maxLen: Int) =
    flatten(
      transform(
        sequence(lit(1), length(w)),
        i =>
          transform(
            sequence(lit(1), least(lit(maxLen), length(w) - i + 1)),
            l => w.substr(i, l))))

  /** Viterbi segmentation of one word under a model — shared by
    * training (E-step) and encoding. DP over code points; at each end
    * position the candidate start offsets scan LONGEST piece first and
    * only a STRICT improvement switches, so exact ties keep the longer
    * first piece. Characters absent from the model segment as
    * themselves at `unkLogp`.
    */
  def viterbi(word: String, model: Model): Seq[String] = {
    val cps = {
      val it = word.codePoints().iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) buf += new String(Character.toChars(it.next()))
      buf.toIndexedSeq
    }
    val n = cps.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - model.maxPieceLen)
      while (start < end) {
        if (best(start) != Double.NegativeInfinity) {
          val piece = cps.slice(start, end).mkString
          val lp = model.logp.get(piece) match {
            case Some(p) => p
            case None => if (end - start == 1) model.unkLogp
              else Double.NegativeInfinity
          }
          if (lp != Double.NegativeInfinity) {
            val cand = best(start) + lp
            if (cand > best(end)) {
              best(end) = cand
              back(end) = start
            }
          }
        }
        start += 1
      }
      end += 1
    }
    // reconstruct
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val s = back(pos)
      out += cps.slice(s, pos).mkString
      pos = s
    }
    out.reverse.toSeq
  }

  /** Lexicographic order on UTF-8 bytes — the collation Spark's
    * orderBy applies to string columns. Used for every driver-side
    * piece tie-break so distributed and driver sorts agree on non-BMP
    * text.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Train a unigram-LM tokenizer from the corpus. Returns the model
    * and the final (piece, cnt) frame-shaped counts as a driver Seq
    * (piece-vocab-sized, NOT data-sized).
    *
    * Pipeline: seed = top `seedSize` substrings by total weighted
    * frequency (single chars always added), initial probs ∝ seed
    * frequency; then `emIters` hard-EM rounds (Viterbi counts,
    * integer aggregation, renormalize); then prune to `vocabSize`
    * keeping all single chars; one final EM round re-estimates the
    * pruned model's probs.
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int = 500,
      seedSize: Int = 1000,
      maxPieceLen: Int = 6,
      emIters: Int = 3): Model = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need seedSize >= vocabSize >= 1, got $seedSize/$vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val spark = df.sparkSession
    import spark.implicits._
    val words = graft.ops.Stage.materializeOnce(wordFreq(df, textCol))
    // ---- seeding: candidate substrings, weighted, top-k + all chars
    val cand = words
      .select(explode(substrings(col("w"), maxPieceLen)).as("piece"),
        col("n"))
      .groupBy("piece")
      .agg(sum("n").as("cnt"))
    val seeds = cand
      .orderBy(desc("cnt"), col("piece"))
      .limit(seedSize)
      .as[(String, Long)]
      .collect()
    val chars = cand
      .where(length(col("piece")) === 1)
      .as[(String, Long)]
      .collect()
    val seedCounts: Map[String, Long] =
      (seeds ++ chars).groupBy(_._1).map { case (p, xs) => p -> xs.head._2 }
    def toModel(counts: Map[String, Long]): Model = {
      val total = counts.values.sum.toDouble
      Model(
        counts.map { case (p, c) => p -> math.log(c / total) },
        maxPieceLen)
    }
    var model = toModel(seedCounts)
    // ---- hard-EM rounds: Viterbi counts (integer), renormalize.
    // Single chars keep a count floor of 1 so coverage never collapses
    // even when every occurrence is absorbed by longer pieces.
    def emRound(m: Model, restrictTo: Option[Set[String]]): Model = {
      val bModel = spark.sparkContext.broadcast(m)
      val seg = udf((w: String, n: Long) =>
        viterbi(w, bModel.value).map(p => (p, n)))
      val counts = words
        .select(explode(seg(col("w"), col("n"))).as("pc"))
        .select(col("pc._1").as("piece"), col("pc._2").as("cnt"))
        .groupBy("piece")
        .agg(sum("cnt").as("cnt"))
        .as[(String, Long)]
        .collect()
        .toMap
      val kept = restrictTo match {
        case Some(keep) => counts.filter { case (p, _) => keep(p) }
        case None => counts
      }
      val withChars = m.logp.keysIterator
        .filter(p => p.codePointCount(0, p.length) == 1)
        .map(c => c -> math.max(kept.getOrElse(c, 0L), 1L))
        .toMap
      toModel(kept.filter { case (p, c) =>
        c > 0 && !withChars.contains(p)
      } ++ withChars)
    }
    var i = 0
    while (i < emIters) { model = emRound(model, None); i += 1 }
    // ---- prune to vocabSize on (prob desc, piece asc), chars always in.
    // "piece asc" must mean the SAME collation the seed top-k used:
    // Spark's orderBy on a string column is UTF-8 BYTE order, while
    // Java's natural String ordering compares UTF-16 units — the two
    // disagree when a supplementary code point (surrogate pair,
    // U+10000+) ties on count against a BMP piece in [U+E000, U+FFFF].
    // Compare UTF-8 bytes here so the trained vocab honors one
    // documented (count desc, piece asc-by-UTF-8) contract end to end.
    val charPieces = model.logp.keySet
      .filter(p => p.codePointCount(0, p.length) == 1)
    val ranked = model.logp.toSeq
      .sortWith { case ((pa, la), (pb, lb)) =>
        if (la != lb) la > lb else utf8Less(pa, pb)
      }
      .map(_._1)
    val keep = scala.collection.mutable.LinkedHashSet.empty[String]
    keep ++= charPieces
    ranked.iterator
      .filter(p => !keep.contains(p))
      .take(math.max(0, vocabSize - keep.size))
      .foreach(keep += _)
    model = emRound(model, Some(keep.toSet))
    model
  }

  /** Encode a corpus under a trained model: Viterbi over the DISTINCT
    * words (vocab-bounded UDF — the [[Bpe.encodeWords]] factoring,
    * including the explicit AQE-exempt repartition), returned as
    * (w, pieces). Per-occurrence cost downstream is an equi-join.
    */
  def encodeWords(
      words: DataFrame,
      wordCol: String,
      model: Model): DataFrame = {
    val spark = words.sparkSession
    val bModel = spark.sparkContext.broadcast(model)
    val enc = udf((w: String) =>
      if (w == null) null else viterbi(w, bModel.value))
    words
      .select(col(wordCol).as("w"))
      .distinct()
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("pieces", enc(col("w")))
  }
}
