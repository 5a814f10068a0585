package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Byte-pair-encoding merge training over a corpus — the tokenizer-prep
  * pass of an LLM data pipeline (Sennrich et al., arXiv:1508.07909),
  * Spark-first.
  *
  * The scale insight BPE trainers rely on: merges are learned from the
  * WORD-FREQUENCY table, not the corpus. One corpus pass builds
  * (word → count) — vocabulary-sized, orders of magnitude smaller than
  * 100 TB of text — and every merge iteration is then one partial+final
  * aggregation over that table plus one narrow higher-order-function
  * rewrite of the symbol arrays. No UDF anywhere: pair extraction,
  * argmax, and the greedy left-to-right merge application are all
  * Catalyst expressions (`transform` / `aggregate` folds), so each
  * round stays inside codegen and shuffles only (pair, partial-count)
  * rows.
  *
  * Iteration is inherently sequential (merge i+1's counts depend on
  * merge i's rewrite — the published algorithm), so the driver loops
  * nMerges times launching one small job each; state between rounds is
  * the re-materialized vocab frame (`Stage.materializeOnce` bounds
  * lineage/plan depth at one round).
  */
object Bpe {

  /** (symbols, n): one row per distinct lowercased whitespace word,
    * symbols = its character array. The ONLY corpus-sized pass.
    */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("n"))
      .select(splitChars(col("w")).as("symbols"), col("n"))

  /** Character array of a string (1 char per element). The empty
    * guard matters: `sequence(1, 0)` infers step −1 and yields [1, 0],
    * so an unguarded split turns "" into TWO empty symbols (latent
    * until [[encodeWords]] met arbitrary input; `vocab`'s tokenizer
    * never emits empty words).
    */
  def splitChars(w: Column): Column =
    when(length(w) === 0, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))

  /** Adjacent symbol pairs of each vocab row, weighted by word count:
    * (a, b, cnt) summed across the vocabulary — the table the next
    * merge decision reads. One explode of (pairs per word) + one
    * partial+final agg; the exchange carries (pair, partial sum).
    */
  def pairCounts(vocabDf: DataFrame): DataFrame =
    vocabDf
      .where(size(col("symbols")) >= 2)
      .select(
        explode(
          transform(
            sequence(lit(1), size(col("symbols")) - 1),
            i =>
              struct(
                element_at(col("symbols"), i).as("a"),
                element_at(col("symbols"), i + 1).as("b")))).as("p"),
        col("n"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("n"))
      .groupBy("a", "b")
      .agg(sum("n").as("cnt"))

  /** Greedy left-to-right application of ONE merge (a,b)→ab to a symbol
    * array, as a pure `aggregate` fold: carry the last uncommitted
    * symbol; when (carry, next) == (a, b) emit the merged symbol and
    * clear the carry (so "aaa" under (a,a) becomes ["aa","a"], the
    * non-overlapping scan of the reference algorithm). O(len) work,
    * no explode, stays in codegen.
    */
  def applyMerge(symbols: Column, a: String, b: String): Column = {
    val merged = a + b
    val noCarry = lit(null).cast(StringType)
    // The input column is referenced EXACTLY ONCE. An earlier form
    // seeded the fold with (acc = slice(symbols,1,0), carry =
    // get(symbols,0)) and folded over slice(symbols, 2, …) — four
    // references to `symbols` per level, so chaining n merges
    // ([[applyMerges]]) built a 4^n-node expression tree and a
    // BpeSpec fold-vs-reference differential spent 17 MINUTES inside
    // Catalyst transformDown. Folding the whole array from a null
    // carry is semantically identical (the step's first branch adopts
    // the first element as the carry) and keeps the chained tree
    // linear in the merge count.
    val zero = struct(
      typedLit(Seq.empty[String]).as("acc"),
      noCarry.as("carry"))
    aggregate(
      symbols,
      zero,
      (st, x) => {
        val acc = st.getField("acc")
        val carry = st.getField("carry")
        when(carry.isNull, struct(acc.as("acc"), x.as("carry")))
          .when(
            carry === lit(a) && x === lit(b),
            struct(
              concat(acc, array(lit(merged))).as("acc"),
              noCarry.as("carry")))
          .otherwise(
            struct(concat(acc, array(carry)).as("acc"), x.as("carry")))
      },
      st =>
        when(
          st.getField("carry").isNull,
          st.getField("acc"))
          .otherwise(concat(st.getField("acc"), array(st.getField("carry")))))
  }

  /** Chain [[applyMerge]] for an ordered merge list — encodes NEW text
    * under an already-learned tokenizer. Expression depth grows with
    * `merges.size`; fine for the tens of merges a spec or demo applies,
    * use the iterative trainer's materialized vocab for big tables.
    */
  def applyMerges(symbols: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols) { case (s, (a, b)) => applyMerge(s, a, b) }

  /** Encode a corpus's DISTINCT words under an ordered merge list —
    * the scale form of [[applyMerges]] for corpus-wide encoding. Two
    * deliberate choices:
    *
    *  1. encode the VOCABULARY, not the token stream: each distinct
    *     word is merged once and the corpus joins against the result
    *     (w → symbols) — classic tokenizer-apply factoring, the
    *     per-occurrence work is an equi-join, not a fold;
    *  2. on this VOCAB-BOUNDED frame the merge scan is a plain Scala
    *     UDF ([[encodeWordReference]], the same function the spec
    *     differentials the fold against) — NOT the codegen'd
    *     [[applyMerges]] fold: stacking tens of `aggregate`-folds in
    *     one projection is Janino-compile-bound (measured: ~2 s per
    *     6-merge chunk, and 24 stacked folds OOM a 4 GB driver), and
    *     chunked staging still pays seconds of driver compile per
    *     chunk per plan. A UDF is the documented exception exactly
    *     here (the cmsEstimateUdf rationale): it runs over distinct
    *     words — bounded by vocabulary, never by data — while the
    *     data-sized path stays declarative. [[applyMerges]] remains
    *     the right form for FEW merges inline over real row streams
    *     ([[trainMerges]] applies one per round).
    *
    * @return (`w`, `symbols`) — one row per distinct word
    */
  def encodeWords(
      words: DataFrame,
      wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = udf((w: String) =>
      if (w == null) null else encodeWordReference(w, merges))
    words
      .select(col(wordCol).as("w"))
      .distinct()
      // EXPLICIT repartition: the distinct vocab frame is tiny in bytes,
      // so AQE coalesces it to ONE partition — and then the merge-scan
      // UDF (whose cost AQE cannot see) runs single-threaded (profiled:
      // a 2.6 s 1-task stage dominating q197). A user-specified count is
      // exempt from AQE coalescing, so the encode parallelizes.
      .repartition(words.sparkSession.sparkContext.defaultParallelism)
      .withColumn("symbols", enc(col("w")))
  }

  /** Learn `nMerges` merges from the corpus. Returns the ordered merge
    * list and the final symbolized vocabulary (symbols, n). Stops early
    * when no pair reaches `minCount`. Ties break deterministically on
    * (count desc, a, b) — same rule the oracle spec replays.
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      minCount: Long = 2): (Seq[(String, String)], DataFrame) = {
    var v = graft.ops.Stage.materializeOnce(vocab(df, textCol))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val top = pairCounts(v)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        v = graft.ops.Stage.materializeOnce(
          v.select(applyMerge(col("symbols"), a, b).as("symbols"), col("n")))
      }
    }
    (merges.toSeq, v)
  }

  /** Reference greedy scan on one word, driver-side — the independent
    * implementation BpeSpec differentials the column fold against.
    */
  def encodeWordReference(
      word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    // split by CODE POINTS, not UTF-16 code units: [[splitChars]]
    // (Spark `substr`) counts code points, so a non-BMP char (emoji)
    // is ONE symbol there — `word.map(_.toString)` would shatter it
    // into two lone surrogates and diverge from training
    var syms: Seq[String] = word
      .codePoints()
      .toArray
      .toSeq
      .map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }
}
