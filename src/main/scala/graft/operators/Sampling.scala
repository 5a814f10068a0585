package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data curation.
  *
  * `df.sample()` is seed-dependent on partitioning and not reproducible
  * across engines; content-hash bucketing is: a row is kept iff the
  * first byte of md5(content) falls under the rate threshold. The same
  * rows are selected on any cluster size, any engine with md5, any run —
  * which is what dataset curation needs (decisions must be replayable).
  *
  * Selection is a pure narrow filter — pushes to the scan side, no
  * shuffle, scales trivially.
  */
object Sampling {

  /** WINSORIZE — clip a numeric column at per-group percentile bounds
    * (the outlier-taming pass of feature/quality pipelines:
    * `gb[col].clip(q05, q95)`). Two jobs: one grouped percentile
    * aggregation producing ONE ROW PER GROUP (so the bounds side is
    * broadcast-size by construction — AQE broadcasts the join back), then
    * a narrow `least(greatest(...))` clip on the fact side, which never
    * shuffles. Emits `⟨valueCol⟩_wins`.
    *
    * `approx = false` uses Spark's exact interpolated `percentile` —
    * q27's SCALE BOUND applies (full per-group value multiset in the agg
    * buffer; fine at oracle scale, wrong at 100 TB). `approx = true` is
    * the 100-TB path: `approx_percentile` keeps a bounded KLL-style
    * sketch per group and clips at bounds within `accuracy` rank error —
    * winsorizing is exactly the operation where a small bound error is
    * immaterial (the q43 twin rationale).
    */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String],
      lo: Double = 0.05,
      hi: Double = 0.95,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(0 <= lo && lo <= hi && hi <= 1, s"need 0<=lo<=hi<=1, got $lo/$hi")
    val q = s"`$valueCol`" // backtick: names with spaces/dots must parse
    val (loAgg, hiAgg) =
      if (approx)
        (expr(s"approx_percentile($q, $lo, $accuracy)"),
          expr(s"approx_percentile($q, $hi, $accuracy)"))
      else
        (expr(s"percentile($q, $lo)"), expr(s"percentile($q, $hi)"))
    val bounds = df
      .groupBy(keys.map(col): _*)
      .agg(loAgg.as("__lo"), hiAgg.as("__hi"))
    // null-SAFE key equality: groupBy emits a bounds row for the
    // null-key group, and a plain USING join would silently DROP every
    // null-key input row — a row-preserving transform losing data.
    // bounds is #groups rows by construction — BROADCAST it (guide
    // §3.1): without the hint the planner's post-agg size estimate let
    // this become a shuffle join ON THE GROUP KEY, exchanging the whole
    // input by a low-cardinality (hence skewed) key at any scale —
    // PlanSpec "hint is load-bearing" pins exactly this (un-hinted
    // twin degrades to SMJ once the estimate misses the threshold).
    // CALLER CONTRACT (round-17 advice): the hint is unconditional, so
    // `keys` must be LOW-CARDINALITY (#groups × ~24 bytes must fit a
    // broadcast build — millions of groups are fine, billions are
    // not); winsorizing by a near-unique key is statistically
    // meaningless anyway (every group clips to itself), so the
    // contract costs nothing real. A caller that genuinely needs
    // unbounded keys should groupBy+join without this helper.
    val joined =
      if (keys.isEmpty) df.crossJoin(broadcast(bounds))
      else
        keys.foldLeft(
          df.join(
            broadcast(bounds),
            keys.map(k => df(k) <=> bounds(k)).reduce(_ && _)))(
          (d, k) => d.drop(bounds(k)))
    joined
      .withColumn(
        valueCol + "_wins",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** keep iff 16-bit bucket of md5(c) < rate·65536 (rate in [0,1]) —
    * 16 bits, not 8: a 1/256 grid rounds rate 0.001 to ZERO kept rows
    * and distorts small rates by up to 2× ([[weightedKeepExpr]] used
    * 16 bits for the same reason from the start; rates that are
    * multiples of 1/256 keep the IDENTICAL row set either way).
    */
  def keepExpr(c: Column, rate: Double): Column = {
    val threshold = math.round(rate * 65536).toInt
    conv(substring(md5(c), 1, 4), 16, 10).cast("int") < threshold
  }

  /** Uniform deterministic sample by content hash. */
  def deterministic(df: DataFrame, contentCol: String, rate: Double): DataFrame =
    df.where(keepExpr(col(contentCol), rate))

  /** QUALITY-WEIGHTED deterministic sample: keep probability =
    * `weight · rate` per row (weight in [0,1] — a quality score), so
    * curation keeps high-quality documents preferentially while staying
    * content-hash replayable ([[keepExpr]]'s rationale: same rows
    * selected on any cluster size, any engine, any run). Uses a 16-bit
    * hash bucket (65536 levels) so small weight differences still move
    * the threshold. Pure narrow filter — pushes toward the scan, no
    * shuffle.
    */
  def weightedKeepExpr(c: Column, weight: Column, rate: Double): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int") <
      weight * rate * 65536.0

  def qualityWeighted(
      df: DataFrame,
      contentCol: String,
      weight: Column,
      rate: Double): DataFrame =
    df.where(weightedKeepExpr(col(contentCol), weight, rate))

  /** Deterministic train/val/test split — the assignment every training
    * pipeline needs to be REPLAYABLE: split membership is a pure
    * function of (content hash, seed), so the same document lands in
    * the same split on any cluster size, any engine, any rerun, and
    * adding documents never moves existing ones between splits (the
    * property random() splits lack). 16-bit md5 bucket (the
    * [[keepExpr]] mechanism) cut at the cumulative weight boundaries.
    *
    * @param weights (splitName, weight) in order; weights normalized
    * @return df + `split` column. Pure narrow projection — no shuffle,
    *         survives any scale.
    */
  def hashSplit(
      df: DataFrame,
      contentCol: String,
      weights: Seq[(String, Double)],
      seed: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights")
    val total = weights.map(_._2).sum
    val bucket =
      conv(substring(md5(concat(col(contentCol), lit(seed))), 1, 4), 16, 10)
        .cast("int")
    val cuts = weights
      .scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail
      .map(f => math.round(f * 65536).toInt)
    val expr = weights.zip(cuts).reverse.foldLeft(lit(weights.last._1)) {
      case (acc, ((name, _), cut)) => when(bucket < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Seeded global shuffle + sharding — the data-loading order pass: a
    * training run wants the corpus in a reproducible pseudo-random
    * order, materialized as (shard, position) so a 1000-file dataset
    * lands in uniform shards with a deterministic within-shard order.
    * Order key = md5(content, seed): engine-portable (the DuckDB oracle
    * computes the identical key), uniform, and independent of input
    * partitioning. The rank is a window per shard — one hash exchange
    * on shard, each shard sorted locally; no global single-partition
    * sort at any scale.
    */
  def seededShuffle(
      df: DataFrame,
      contentCol: String,
      nShards: Int,
      seed: String = "",
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat(col(contentCol), lit(seed)))
    val sharded = df
      .withColumn("__k", key)
      .withColumn(
        "shard",
        pmod(conv(substring(col("__k"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
    // tieBreak makes the order total when contents can repeat (a dedup
    // INPUT corpus) — equal keys would otherwise make `pos` run-dependent
    sharded
      .withColumn(
        "pos",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("shard")
            .orderBy(col("__k") +: tieBreak: _*)) - 1)
      .drop("__k")
  }

  /** Exact-k WEIGHTED sample without replacement (Efraimidis–Spirakis,
    * IPL 2006): each row gets key = −ln(u)/w with u a content-hash
    * uniform, and the k SMALLEST keys are the sample — distributed
    * one-pass, provably the sequential weighted-reservoir answer. This
    * is the resampling step the DSIR recipe (arXiv:2302.03169 §3) runs
    * after [[graft.operators.Dsir.importanceWeights]]: `weight =
    * exp(log_weight)` turns importance scores into selection pressure.
    *
    * Determinism contract ([[keepExpr]]'s): u = (md5₅₂(content‖seed) +
    * 0.5) / 2⁵², so the selected SET is a pure function of (content,
    * seed, weights) — identical on any cluster size, any engine with
    * md5 (the DuckDB oracle replays the key bit-for-bit), any rerun.
    * No RNG, no seed-per-partition drift.
    *
    * Scale: the key is a narrow codegen'd projection; `orderBy.limit(k)`
    * plans as TakeOrderedAndProject — per-partition top-k heaps + one
    * k-row driver merge, never a global sort, never an Exchange
    * SinglePartition. Supply `tieBreak` (a unique column) when contents
    * can repeat, else the boundary row is run-dependent.
    *
    * @param weight strictly-positive column (rows with w ≤ 0 or null
    *               are excluded — zero weight means "never sample")
    */
  /** The Efraimidis–Spirakis sampling key −ln(u)/w with u a 52-bit
    * md5-content uniform: 13 hex chars fit a double's mantissa exactly
    * (u is exact in any engine), +0.5 keeps u strictly inside (0,1).
    * One definition shared by [[weightedSampleK]],
    * [[weightedSamplePerGroup]], and the streaming twin
    * ([[graft.streaming.StreamSample]]) — the key being a pure
    * function of (content, seed, weight) is what makes every sampler
    * built on it replayable and batching-invariant.
    */
  def esKey(content: Column, weight: Column, seed: String): Column = {
    val v = conv(
      substring(md5(concat(content, lit(seed))), 1, 13), 16, 10)
      .cast("long")
    val u = (v.cast("double") + 0.5) / lit(4503599627370496.0) // 2^52
    -log(u) / weight
  }

  def weightedSampleK(
      df: DataFrame,
      contentCol: String,
      weight: Column,
      k: Int,
      seed: String = "",
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.where(weight > 0)
      .withColumn("__esk", esKey(col(contentCol), weight, seed))
      .orderBy(col("__esk") +: tieBreak: _*)
      .limit(k)
      .drop("__esk")
  }

  /** Per-GROUP weighted k-sample — the quota form of
    * [[weightedSampleK]]: k docs per group (e.g. per source domain)
    * drawn without replacement under weight pressure, deterministic by
    * the same content-hash contract. Groups with fewer than k positive-
    * weight rows keep them all.
    *
    * Scale: the Efraimidis–Spirakis key is a narrow projection and
    * `row_number ≤ k` is recognized by WindowGroupLimit — map tasks
    * pre-prune to their local per-group top-k BEFORE the exchange
    * ([[capPerGroup]]'s argument), so the shuffle carries O(parts·k)
    * rows per group, never the group.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      contentCol: String,
      weight: Column,
      groupCols: Seq[Column],
      k: Int,
      seed: String = "",
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    capPerGroup(
      df.where(weight > 0)
        .withColumn("__esk", esKey(col(contentCol), weight, seed)),
      groupCols,
      col("__esk") +: tieBreak,
      k).drop("__esk")
  }

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample
    * dominant languages, keep all of rare ones). Unlisted strata keep
    * `defaultRate`.
    */
  def stratified(
      df: DataFrame,
      contentCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val keep = rates.foldLeft(
      when(lit(false), lit(false))) { case (acc, (stratum, rate)) =>
      acc.when(col(stratumCol) === stratum, keepExpr(col(contentCol), rate))
    }.otherwise(keepExpr(col(contentCol), defaultRate))
    df.where(keep)
  }

  /** Corpus vocabulary stats: term → total occurrences and document
    * frequency over whitespace tokens — the vocab-building pass of a
    * text pipeline. One explode + one partial+final aggregation; the
    * exchange carries (term, partial counts), never documents.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol).as("__doc"),
        explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
          .as("term"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("total_count"),
        countDistinct(col("__doc")).as("doc_freq"))

  /** TF-IDF per (doc, term): tf * ln(N / df). Two aggregations (term
    * frequencies per doc; document frequencies per term) joined on term.
    *
    * No forced broadcast on the df side: at web scale the vocabulary is
    * billions of terms — a mandatory BroadcastExchange there OOMs the
    * cluster. AQE still broadcasts when the table genuinely fits. N is a
    * one-row lazy aggregate cross-joined in (broadcast of one row), not a
    * separate driver `count()` pass.
    */
  /** Per-group cap: keep the top `n` rows of each group under a
    * DETERMINISTIC total order (make the last `orderBy` column a unique
    * tiebreaker, or the kept set is engine/run-dependent at the cap
    * boundary). The per-source caps of web-corpus curation ("≤ n docs
    * per domain").
    *
    * Scale: `row_number <= n` is recognized by Spark's WindowGroupLimit
    * optimization — each map task pre-prunes to its local top-n BEFORE
    * the exchange, so the shuffle carries O(parts·n) rows per group,
    * not the whole group (asserted in PlanSpec). A hot key costs one
    * sort of its surviving rows, never an unbounded buffer.
    */
  def capPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderBy: Seq[Column],
      n: Int): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Unigram-LM surprisal per document — the corpus-statistics quality
    * signal (a cheap stand-in for model perplexity): score every token
    * occurrence by −ln p(term) under the corpus unigram distribution and
    * average per document. Low = boilerplate/repetitive, high = rare-token
    * soup; both tails are what quality filters cut.
    *
    * Shape: one explode feeds both the term-count aggregation and the
    * scoring join (hash-partitioned on term, co-partitioned with the
    * counts it joins — AQE broadcasts the count table when the
    * vocabulary fits); the corpus total is a one-row lazy aggregate
    * cross-joined in (broadcast of one row, not a driver count() —
    * [[tfIdf]]'s rationale). Rounded to 5: the per-doc avg of logs is
    * order-sensitive at ~1e-15 relative.
    */
  def unigramSurprisal(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = df
      .select(
        col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
          .as("term"))
      // three consumers with DIFFERENT exchange subtrees (probe side,
      // term counts, global total) — ReuseExchange cannot dedupe them,
      // so without this the corpus re-tokenizes three times
      .transform(graft.ops.Stage.materializeOnce)
    val counts = toks.groupBy("term").agg(count(lit(1)).as("__c"))
    val total = toks.agg(count(lit(1)).cast("double").as("__n"))
    toks
      .join(counts, Seq("term"))
      .crossJoin(total)
      .groupBy("doc_id")
      .agg(round(avg(-log(col("__c") / col("__n"))), 5).as("surprisal"))
  }

  /** Okapi BM25 ranked retrieval over the corpus (Robertson et al.,
    * TREC-3; the Lucene-default scoring function) — the probabilistic
    * sibling of [[tfIdf]] and the principled replacement for q156's
    * raw-tf sparse channel: per query term,
    * idf·tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) with
    * idf = ln(1 + (N−df+0.5)/(df+0.5)), summed per document.
    *
    * Plan shape (the impact-ordered posting scan, relational form):
    * ONE corpus tokenize feeds tf (doc,term), dl (doc length), and df
    * (term doc-frequency, derived from tf rows — no second explode);
    * the query-term list broadcasts and prunes tf FIRST, so every
    * downstream join carries only posting rows of the query's terms;
    * N and avgdl ride as a broadcast 1-row aggregate; top-k plans as
    * TakeOrderedAndProject (per-partition heaps + a k-row driver
    * merge), never a global sort.
    *
    * Engine-portable determinism: scores round to 6 decimals BEFORE
    * ranking and ties break on doc_id, so the top-k cut is identical
    * in any engine whose ln/division agree to ~1e-7 (the q33
    * precedent); summation-order noise across partial aggregates sits
    * ~8 digits below the rounding.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus tokenize, materialized once: tf feeds FOUR consumers
    // (posting rows, doc lengths, query-term doc frequencies, the
    // total-token scalar) — without the checkpoint each consumer would
    // re-explode the corpus; dl and the token total derive from tf
    // (sum of per-doc tfs IS the doc length), and df is computed on
    // the query-PRUNED posting rows, never as a full-vocabulary agg
    val tf = graft.ops.Stage.materializeOnce(
      df.select(
          col(idCol).as("doc_id"),
          explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
            .as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf")))
    val qTerms = query.distinct.toDF("term")
    val posting = tf.join(broadcast(qTerms), Seq("term"))
    // dl only for docs that MATCH a query term: the corpus-wide dl
    // frame joined against the pruned postings was one avoidable
    // corpus-cardinality exchange. The match-doc list is bounded by
    // the pruned postings (the smallness assumption this inline path
    // is built on; [[bm25ProbeMany]] denormalizes dl onto the
    // persisted postings instead, so the index path never computes dl
    // at probe time at all), so broadcast it into the tf scan and
    // aggregate doc length over matched rows only.
    val dl = tf
      .join(broadcast(posting.select("doc_id").distinct()), Seq("doc_id"))
      .groupBy("doc_id")
      .agg(sum("tf").as("dl"))
    val dfreq = posting.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = df
      .agg(count(lit(1)).cast("double").as("__n"))
      .crossJoin(tf.agg(sum("tf").cast("double").as("__toks")))
      .select(col("__n"), (col("__toks") / col("__n")).as("__avgdl"))
    val idf = log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl")))
    posting
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(dl), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(idf * tfNorm).as("__s"))
      .select(col("doc_id"), round(col("__s"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Persist the build-once BM25 inverted index — the sparse-retrieval
    * counterpart of the ANN family's build-once / probe-many
    * discipline ([[graft.operators.Similarity.lshWriteIndex]],
    * [[Dedup.minHashWriteIndex]]): [[bm25TopK]] re-tokenizes the
    * corpus per query; this pays the tokenize ONCE and every probe
    * reads only its own terms' postings.
    *
    * Layout (`$path/postings`, partitioned by `shard`):
    * (term, doc_id, tf, dl) with `shard = pmod(hash(term), nShards)` —
    * a bounded directory count (a vocabulary-sized partitionBy(term)
    * would explode the filesystem), pruned at probe time to the query
    * terms' shards; within each shard the rows are SORTED BY TERM so
    * the probe's pushed `term IN (...)` filter also skips row groups
    * on parquet min/max stats. `dl` is DENORMALIZED onto every posting
    * row (the Lucene norms-in-postings trick): the probe path scores
    * from pruned posting rows plus two broadcast scalars alone — no
    * corpus-cardinality join or exchange anywhere at probe time.
    * Per-term df is NOT stored: postings are complete per term, so the
    * probe's count over its own pruned rows IS the exact global df.
    *
    * `_meta` records (N, avgdl, nShards, source) and is validated by
    * the probe — wrong nShards or a cross-wired source is an error,
    * not silently wrong ranks.
    */
  def bm25WriteIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      nShards: Int = 64,
      sourceTag: String = ""): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val spark = df.sparkSession
    val tf = graft.ops.Stage.materializeOnce(
      df.select(
          col(idCol).as("doc_id"),
          explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
            .as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf")))
    // dl rides a window over the doc partition rather than a self-join:
    // one exchange, and the build is the right place to pay the
    // corpus-wide doc-length pass (amortized over every later probe)
    val win = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    tf.withColumn("dl", sum("tf").over(win))
      .withColumn("shard", pmod(hash(col("term")), lit(nShards)))
      .repartition(col("shard"))
      .sortWithinPartitions("term")
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .parquet(s"$path/postings")
    val statsRow = df
      .agg(count(lit(1)).cast("double").as("n"))
      .crossJoin(tf.agg(
        coalesce(sum("tf"), lit(0L)).cast("double").as("toks")))
      .head()
    val n = statsRow.getDouble(0)
    val toks = statsRow.getDouble(1)
    writeBm25Meta(spark, s"$path/_meta", n, toks, nShards, sourceTag)
  }

  /** `_meta` writer shared by [[bm25WriteIndex]] and
    * [[bm25AppendIndex]]: (n, avgdl, toks, nShards, source). `toks`
    * (the exact corpus token total — integer counts carried in a
    * double, exact far past any local corpus) exists so an APPEND can
    * merge stats exactly: avgdl' = (toks + batchToks)/(n + batchN) is
    * the same division a full rebuild computes, whereas reconstructing
    * toks from n·avgdl would reintroduce the division's rounding and
    * let probe-vs-rebuild scores drift at the last ulp.
    */
  private def writeBm25Meta(
      spark: org.apache.spark.sql.SparkSession,
      metaPath: String,
      n: Double,
      toks: Double,
      nShards: Int,
      sourceTag: String): Unit =
    spark
      .range(1)
      .select(
        lit(n).as("n"),
        lit(if (n > 0) toks / n else 0.0).as("avgdl"),
        lit(toks).as("toks"),
        lit(nShards).as("nShards"),
        lit(sourceTag).as("source"))
      .write
      .mode("overwrite")
      .parquet(metaPath)

  /** Current corpus stats of a BM25 index: the LATEST committed
    * append segment's `_meta` if any (each [[bm25AppendIndex]] stages
    * its merged stats INSIDE the segment it publishes, so postings and
    * stats commit under one marker — a crash can never publish one
    * without the other), else the build's `$path/_meta`.
    */
  private[graft] def bm25ReadMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.Row = {
    val metaPath = graft.operators.AtomicAppend
      .latestSegFile(spark, s"$path/postings", "_meta")
      .getOrElse(s"$path/_meta")
    spark.read.parquet(metaPath).head()
  }

  /** Incremental BM25 index maintenance — the sparse-retrieval twin of
    * [[graft.operators.Similarity.ivfAppendIndex]]: tokenize ONLY the
    * new batch, append its posting rows into the existing shard layout
    * (same shard hash, same within-file term sort), and merge the
    * corpus stats exactly (doc counts and token totals are additive).
    *
    * Probe-equivalence contract, load-bearing for the q223 oracle: a
    * probe of the appended index is BIT-IDENTICAL to a probe of a full
    * rebuild over old ∪ new —
    *  - posting rows are per-doc (tf and dl never cross documents), so
    *    the union of old and batch rows IS the rebuild's row set;
    *  - df is computed from the pruned postings at probe time (never
    *    stored), so appended docs are counted automatically;
    *  - avgdl merges as (toks + batchToks)/(n + batchN) — exact
    *    integer arithmetic in doubles, the identical division the
    *    rebuild computes.
    * Pre-`toks` indexes (written before round 12) reconstruct the old
    * token total as n·avgdl — last-ulp noise ~8 digits below the
    * 6-decimal score rounding, and LOUD: the degraded-exactness path
    * warns on stderr with a rebuild hint instead of silently relaxing
    * the bit-identical probe-vs-rebuild contract.
    *
    * Crash-atomic ([[graft.operators.AtomicAppend]]): the batch's
    * postings AND the merged stats are staged into one segment
    * directory and published by a single rename + marker — a mid-write
    * failure leaves nothing a probe honors, and stats can never run
    * ahead of (or behind) the postings they describe. Appending a
    * doc_id that already exists in the index is the caller's bug —
    * postings would double-count it (the same contract as every other
    * append path; the streaming ingest dedups first).
    */
  def bm25AppendIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      sourceTag: String = ""): Unit = {
    val spark = df.sparkSession
    val meta = bm25ReadMeta(spark, path)
    val n = meta.getAs[Double]("n")
    val nShards = meta.getAs[Int]("nShards")
    val built = meta.getAs[String]("source")
    require(
      sourceTag.isEmpty || built == null || built.isEmpty ||
        built == sourceTag,
      s"BM25 index at $path was built from source '$built'; append " +
        s"expected source '$sourceTag' — refusing to cross-wire indexes")
    val oldToks =
      if (meta.schema.fieldNames.contains("toks")) meta.getAs[Double]("toks")
      else {
        System.err.println(
          s"[graft] WARN bm25AppendIndex: index at $path predates the " +
            "exact token-total stat (no 'toks' in _meta); reconstructing " +
            "it as n*avgdl, which can drift probe-vs-rebuild scores at " +
            "the last ulp. Rebuild via bm25WriteIndex to restore the " +
            "bit-identical contract.")
        n * meta.getAs[Double]("avgdl")
      }
    val tf = graft.ops.Stage.materializeOnce(
      df.select(
          col(idCol).as("doc_id"),
          explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
            .as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf")))
    val win = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    graft.operators.AtomicAppend
      .publish(spark, s"$path/postings", keepIfMetaOnly = true) { staging =>
      tf.withColumn("dl", sum("tf").over(win))
        .withColumn("shard", pmod(hash(col("term")), lit(nShards)))
        .repartition(col("shard"))
        .sortWithinPartitions("term")
        .write
        .mode("overwrite")
        .partitionBy("shard")
        .parquet(staging)
      val batchRow = df
        .agg(count(lit(1)).cast("double").as("n"))
        .crossJoin(tf.agg(
          coalesce(sum("tf"), lit(0L)).cast("double").as("toks")))
        .head()
      writeBm25Meta(
        spark,
        s"$staging/_meta",
        n + batchRow.getDouble(0),
        oldToks + batchRow.getDouble(1),
        nShards,
        if (built == null) "" else built)
    }
    // auto-fold: posting rows rewrite into the same shard layout with
    // the within-shard term sort restored (the probe's row-group
    // skipping rides on it); the carried `_meta` keeps the newest
    // merged (n, toks, avgdl) resolving after covered segments delete
    graft.operators.AtomicAppend
      .maybeCompact(spark, s"$path/postings") { (d, staging) =>
        d.repartition(col("shard"))
          .sortWithinPartitions("term")
          .write
          .mode("overwrite")
          .partitionBy("shard")
          .parquet(staging)
      }
  }

  /** Batch BM25 retrieval over a persisted index: top-k documents for
    * EVERY query of a broadcast query batch in one plan — per query
    * term-for-term identical scores to the inline [[bm25TopK]]
    * (asserted by SamplingSpec), with none of its per-query corpus
    * work.
    *
    * Plan shape: the query batch's distinct terms prune the postings
    * scan twice — a PARTITION filter on the terms' shards (driver-
    * computed from the same hash the build used) plus a term
    * restriction inside the surviving shards that auto-switches on
    * batch size ([[IndexProbe.restrictByLocalKeys]]): a pushed
    * `term IN (...)` literal that skips row groups (the build sorts
    * by term) for ordinary batches, a broadcast semi-join of the term
    * frame past ~1k distinct terms. df per term is one
    * tiny aggregate over the pruned rows (exact — postings are
    * complete per term); query_id attachment and df both join
    * BROADCAST; scoring groups by (query_id, doc_id); ranking is a
    * per-query window over the scored rows (hash-partitioned by
    * query_id — never a global sort or single partition). Scores round
    * to 6 decimals BEFORE ranking, ties break on doc_id — the
    * [[bm25TopK]] determinism contract.
    */
  def bm25ProbeMany(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: Seq[(Long, Seq[String])],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      sourceTag: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import spark.implicits._
    val meta = bm25ReadMeta(spark, indexPath)
    val n = meta.getAs[Double]("n")
    val avgdl = meta.getAs[Double]("avgdl")
    val nShards = meta.getAs[Int]("nShards")
    val built = meta.getAs[String]("source")
    require(
      sourceTag.isEmpty || built == null || built.isEmpty ||
        built == sourceTag,
      s"BM25 index at $indexPath was built from source '$built'; probe " +
        s"expected source '$sourceTag' — refusing to cross-wire indexes")
    val qx = queries
      .flatMap { case (qid, terms) => terms.distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val allTerms = queries.flatMap(_._2).distinct
    // the shard list comes from the SAME hash expression the build
    // used, evaluated over the term batch (driver-bounded by the
    // query batch, never the corpus); it stays a LITERAL partition
    // filter at any batch size — its cardinality is capped at nShards
    // (small by construction), and partition pruning needs literals
    val shards = allTerms
      .toDF("term")
      .select(pmod(hash(col("term")), lit(nShards)).as("shard"))
      .distinct()
      .as[Int]
      .collect()
    // the TERM restriction auto-switches (graft.operators.IndexProbe):
    // a pushed `term IN (…)` literal for ordinary batches (row-group
    // skipping — the build sorts by term), a broadcast semi-join of
    // the term frame past ~1k distinct terms (a huge query batch must
    // not bake a plan-sized In-list; the surviving-shard partition
    // filter above still prunes the scan either way)
    val pruned = IndexProbe.restrictByLocalKeys(
      graft.operators.AtomicAppend
        .read(spark, s"$indexPath/postings")
        .where(col("shard").isin(shards.toIndexedSeq.map(Integer.valueOf): _*)),
      "term",
      allTerms,
      allTerms.toDF("term"))
    val dfreq = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    val idf =
      log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    IndexProbe.perQueryTopK(
      pruned
        .join(broadcast(qx), Seq("term"))
        .join(broadcast(dfreq), Seq("term"))
        .groupBy("query_id", "doc_id")
        .agg(sum(idf * tfNorm).as("__s"))
        .select(
          col("query_id"),
          col("doc_id"),
          round(col("__s"), 6).as("bm25")),
      k,
      col("bm25").desc,
      col("doc_id").asc)
  }

  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = df.select(
      col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
        .as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df derives from tf (tf rows are already distinct (doc, term)
    // pairs): one explode + one exchange feed both aggregates — the
    // naive distinct().groupBy() re-exploded the corpus a second time.
    // Staging tf (materializeLazy) was tried in round 16 and MEASURED
    // WORSE (q33 1.2→1.6 s, q156 1.5→2.6 s at sf0.1): persisting the
    // (doc, term, tf) frame costs more than re-running the shared
    // explode+partial-agg, and the LogicalRDD re-root forfeits
    // downstream AQE choices — reverted, recompute kept deliberately
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).cast("double").as("__n"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(nDocs)
      .select(
        col("doc_id"),
        col("term"),
        round(col("tf") * log(col("__n") / col("df")), 6).as("tfidf"))
  }
}
