package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorExpressions, VectorFunctions}

/** Approximate-nearest-neighbor search over an embedding column
  * (extension set — beyond the reference surface).
  *
  * Two paths, as the brief requires:
  *  - [[bruteForceTopK]] — the exact baseline: score every vector (narrow
  *    map, native tight-loop cosine) then global top-k. Spark plans the top-k as
  *    per-partition TakeOrdered partials + a tiny driver merge: only
  *    k rows per partition move, never the corpus.
  *  - [[lshTopK]] — the scale path: hyperplane-LSH signature buckets;
  *    only vectors whose signature shares a band with the query are
  *    scored. Probing b bands of r bits each ≈ IVF with 2^r cells and
  *    b probes. Cuts scored rows by orders of magnitude at 100 TB while
  *    keeping recall tunable (more bands → higher recall).
  *
  * The query vector is a literal baked into the plan (broadcast by
  * value) — no join needed for the 1-query case; [[crossTopK]] covers
  * the many-queries case with a broadcast join.
  */
object Similarity {

  private def vecLit(q: Seq[Double]): Column =
    array(q.map(lit): _*)

  /** Native single-pass cosine (20x the composable zip_with/aggregate
    * form — see functions.CosineSimilarityExpr); registered idempotently
    * on the frame's session.
    */
  private def cos(df: DataFrame)(a: Column, b: Column): Column = {
    VectorExpressions.register(df.sparkSession)
    VectorExpressions.cosineFast(a, b)
  }

  /** Exact top-k by cosine similarity against one query vector. */
  def bruteForceTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Double],
      k: Int): DataFrame =
    df.select(
        col(idCol).as("id"),
        cos(df)(col(vecCol), vecLit(query)).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)

  /** All-pairs scores against one query (no selection — full scoring
    * pass; useful as the verifiable baseline).
    */
  def scoreAll(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Double]): DataFrame =
    df.select(
      col(idCol).as("id"),
      cos(df)(col(vecCol), vecLit(query)).as("sim"))

  /** INT8 scalar quantization of an embedding column — the 4× storage /
    * bandwidth lever of a 100-TB vector corpus (raw float32 vectors
    * dominate scan time; rescoring reads the quantized corpus and only
    * fetches full-precision vectors for the final candidates).
    *
    * Per-DIMENSION affine quantization: one tiny aggregation computes
    * each dimension's [min, max] over the corpus (a ≤dim-element pair of
    * arrays — broadcast-size by construction), then each component maps
    * to round((x − lo) · 255/(hi − lo)) stored as a byte array. A
    * constant dimension (hi == lo) quantizes to 0 and dequantizes to its
    * constant. Returns (df with `⟨vecCol⟩_q8`, bounds frame to persist
    * beside the index — dequantization needs it).
    */
  def quantizeInt8(
      df: DataFrame,
      vecCol: String): (DataFrame, DataFrame) = {
    // per-dimension min/max as a partial+final aggregation (posexplode →
    // groupBy dim): the exchange carries one (dim, lo, hi) partial per
    // partition — never whole vectors; the final collect_list is over
    // ≤dim rows
    val perDim = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "x")))
      .groupBy("p")
      .agg(min("x").as("l"), max("x").as("h"))
    val bounds = perDim.agg(
      transform(
        array_sort(collect_list(struct(col("p"), col("l")))),
        s => s("l")).as("lo"),
      transform(
        array_sort(collect_list(struct(col("p"), col("h")))),
        s => s("h")).as("hi"))
    val quantized = df
      .crossJoin(broadcast(bounds))
      .withColumn(
        vecCol + "_q8",
        // fused encode (round 17, [[graft.functions.SqEncodeColsExpr]]
        // — bit parity with [[quantizeInt8Composable]], the previous
        // three-zip_with interpreted form kept below as the spec;
        // ExtensionsSpec differences them). Codes stored as REAL
        // signed bytes (the "int8" the name promises): 0..255 shifted
        // by −128 into byte range
        graft.functions.SqExpressions.encodeCols(
          col(vecCol).cast("array<double>"),
          col("lo"),
          col("hi")))
      .drop("lo", "hi")
    (quantized, bounds)
  }

  /** Dequantize `⟨vecCol⟩_q8` back to doubles given the bounds frame
    * from [[quantizeInt8]] (each component: lo + q·range/255).
    */
  def dequantizeInt8(
      df: DataFrame,
      q8Col: String,
      bounds: DataFrame,
      outCol: String): DataFrame =
    df.crossJoin(broadcast(bounds))
      .withColumn(
        outCol,
        // fused decode (round 17 — parity spec'd against
        // [[dequantizeInt8Composable]]); +128 undoes the signed shift
        graft.functions.SqExpressions
          .dequantizeCols(col(q8Col), col("lo"), col("hi")))
      .drop("lo", "hi")

  /** The pre-round-17 composable encode — the executable SPEC
    * [[SqEncodeColsExpr]] is differenced against (ExtensionsSpec).
    */
  private[graft] def quantizeInt8ComposableCode(v: Column): Column =
    zip_with(
      zip_with(v, col("lo"), (x, l) => x - l),
      zip_with(col("hi"), col("lo"), (h, l) => h - l),
      (num, range) =>
        (when(range === 0d, lit(0))
          .otherwise(round(num * 255d / range)) - 128)
          .cast("tinyint"))

  /** The pre-round-17 composable decode — the executable SPEC
    * [[SqDequantizeColsExpr]] is differenced against (ExtensionsSpec).
    */
  private[graft] def dequantizeInt8ComposableCode(q8: Column): Column =
    zip_with(
      zip_with(q8, col("lo"), (q, l) => struct(q.as("q"), l.as("l"))),
      zip_with(col("hi"), col("lo"), (h, l) => h - l),
      (ql, range) =>
        ql.getField("l") +
          (ql.getField("q").cast("int") + 128) * range / 255d)

  /** Scalar-quantized (int8) top-k with exact rescore — the missing
    * cheap point on the ANN quantization spectrum beside PQ/IVF-PQ
    * (ProductQuant): candidates are ranked on the DEQUANTIZED corpus
    * ([[quantizeInt8]] codes — at 100 TB the quantized scan reads ~4×
    * fewer bytes than float32 and ~8× fewer than float64, which is the
    * whole point; compute per element is unchanged), the top
    * `factor·k` survivors are rescored at FULL precision, and the
    * final k is cut on the exact score. Both cuts are
    * engine-deterministic (the q214 discipline): scores round to 6
    * decimals BEFORE ranking and ties break on id, so the candidate
    * set — and therefore the answer — is a pure function of the data,
    * replayable bit-for-bit by a SQL oracle (the first ANN family
    * member with a hard hash oracle; recall vs the exact answer is the
    * spec's business, determinism is this function's).
    *
    * Plan shape: one bounded aggregation for the per-dim bounds
    * (broadcast), one corpus scan for the approximate scores feeding
    * TakeOrderedAndProject (per-partition heaps — never a global
    * sort), then a BROADCAST semi-join of the ≤ factor·k candidate ids
    * back to the full-precision rows for the rescore. No all-pairs, no
    * corpus shuffle.
    */
  def sqTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Double],
      k: Int,
      factor: Int = 4): DataFrame = {
    require(k > 0 && factor >= 1)
    val (q8, bounds) = quantizeInt8(df, vecCol)
    val deq =
      dequantizeInt8(q8, vecCol + "_q8", bounds, "__deq")
    val cand = deq
      .select(
        col(idCol).as("id"),
        round(cos(df)(col("__deq"), vecLit(query)), 6).as("sim_q8"))
      .orderBy(col("sim_q8").desc, col("id").asc)
      .limit(factor * k)
    df.select(col(idCol).as("id"), col(vecCol))
      .join(broadcast(cand), Seq("id"))
      .select(
        col("id"),
        col("sim_q8"),
        round(cos(df)(col(vecCol), vecLit(query)), 6).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Persist the build-once scalar-quantized index: (id, int8 codes,
    * full-precision vector) in one parquet whose COLUMNAR layout is the
    * index structure — a probe's candidate stage reads only the `q8`
    * codes column (4–8× fewer bytes than the float vectors, the whole
    * point of SQ at 100 TB), and the rescore stage touches the `v`
    * column only for the ≤ factor·k candidate row groups (pushed
    * id-IN filter → min/max row-group skipping). Quantization bounds
    * live in `_meta` beside the source tag ([[checkSource]] — a
    * cross-wired probe is an error, not silently wrong neighbors).
    */
  def sqWriteIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      sourceTag: String = ""): Unit = {
    val (q8, bounds) = quantizeInt8(df, vecCol)
    q8.select(
        col(idCol).as("id"),
        col(vecCol + "_q8").as("q8"),
        col(vecCol).cast("array<double>").as("v"))
      .write
      .mode("overwrite")
      .parquet(path)
    bounds
      .select(col("lo"), col("hi"), lit(sourceTag).as("source"))
      .write
      .mode("overwrite")
      .parquet(s"$path/_meta")
  }

  /** Incremental SQ index maintenance — frozen-quantizer append, the
    * scalar-quantization member of the index-evolution family
    * ([[ivfAppendIndex]] freezes centroids, `bm25AppendIndex` merges
    * stats, minhash/sig64 append segments): quantize the NEW batch
    * under the index's EXISTING per-dim bounds (read from `_meta`,
    * which stays untouched — every probe's dequantize keeps working
    * unchanged) and append (id, q8, v) rows into the columnar layout.
    *
    * Trades, stated (the standard frozen-quantizer evolution):
    * components outside the frozen bounds CLAMP to the nearest code
    * ([[sqEnc]]) — their approximate candidate rank degrades
    * gracefully (recall, not correctness: the rescore always reads
    * the full-precision `v`, so any candidate's final score is
    * exact); a corpus that drifts far from the build-time bounds
    * eventually wants a rebuild, exactly like production SQ systems.
    * For batches WITHIN the frozen bounds the appended codes are
    * bit-identical to a same-bounds rebuild (the q224 oracle
    * contract). Crash-atomic via [[AtomicAppend.publish]] (staged
    * segment + marker — a mid-append crash leaves nothing a probe
    * honors); duplicate-id appends are the caller's bug
    * (the contract of every append path).
    */
  def sqAppendIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      sourceTag: String = "",
      retrainClipFrac: Option[Double] = None): Unit = {
    val spark = df.sparkSession
    val (lo, hi) = sqReadMeta(spark, path, sourceTag)
    // dimension mismatch would zip_with into silent nulls — one cheap
    // batch-sized aggregate makes it an error instead (a NULL min
    // already encodes the empty batch; a separate isEmpty would be a
    // second avoidable action on the append path). The same aggregate
    // carries the batch's clip count (components outside the frozen
    // bounds) — the retrain trigger costs ZERO extra actions.
    val dims = df
      .agg(
        min(size(col(vecCol))).as("mn"),
        max(size(col(vecCol))).as("mx"),
        sum(sqClipSum(lo, hi)(col(vecCol).cast("array<double>")))
          .as("cs"),
        // denominator = NON-NULL vectors, matching what the clip sum
        // aggregates over — counting null-vector rows would dilute
        // the retrain trigger below its documented bar
        count(col(vecCol)).as("n"))
      .head()
    require(
      dims.isNullAt(0) ||
        (dims.getInt(0) == lo.length && dims.getInt(1) == lo.length),
      s"append batch carries vectors of dim ${dims.get(0)}..${dims.get(1)}; " +
        s"index at $path was built with dim ${lo.length}")
    if (dims.isNullAt(0)) return // empty batch: nothing to publish
    AtomicAppend.publish(spark, path) { staging =>
      df.select(
          col(idCol).as("id"),
          sqEnc(lo, hi)(col(vecCol).cast("array<double>")).as("q8"),
          col(vecCol).cast("array<double>").as("v"))
        .write
        .mode("overwrite")
        .parquet(staging)
    }
    val clipFrac =
      if (dims.isNullAt(2) || dims.getLong(3) == 0L)
        0d // only null-vector rows carried values
      else dims.getDouble(2) / (dims.getLong(3).toDouble * lo.length)
    if (clipFrac > retrainClipFrac.getOrElse(sqRetrainClipFracThreshold)) {
      // past the drift bar: ONE rebuild with fresh bounds subsumes the
      // compaction fold (q229's clip_frac metric, acted on — the
      // retrain the frozen-quantizer contract always promised)
      sqRetrain(spark, path)
    } else {
      // auto-fold once the committed view exceeds the leg threshold —
      // codes/vectors rewrite as stored (the frozen bounds make the
      // fold a pure relayout; whichever `_meta` is current carries
      // forward via compact's carryMeta)
      AtomicAppend.maybeCompact(spark, path) { (d, staging) =>
        d.write.mode("overwrite").parquet(staging)
      }
    }
  }

  /** Per-component clip fraction past which an SQ append triggers an
    * automatic [[sqRetrain]] — the `maybeCompact` discipline applied
    * to the q229 drift surface: when more than this share of an
    * appended batch's components saturate against the frozen bounds,
    * candidate ranking is degrading for a visible slice of the batch
    * and the quantizer no longer fits the data. Default 5%: an order
    * of magnitude above the genuinely-clipping q224 append at sf0.01
    * (clip_frac 0.0094 — organic tail clipping that graceful
    * saturation handles), and far below a distribution shift
    * (DriftSpec's 4×-scaled batch clips >20% and should retrain).
    * Override per call via the `retrainClipFrac` parameter of
    * [[sqAppendIndex]]/[[sqMaybeRetrain]] (the race-free form — specs
    * pinning frozen-bounds saturation semantics pass `Some(2)`), or
    * process-wide via the JVM property `graft.sq.retrain.clipfrac`;
    * >= 1 disables.
    */
  val DefaultSqRetrainClipFrac = 0.05

  private def sqRetrainClipFracThreshold: Double = sys.props
    .get("graft.sq.retrain.clipfrac")
    .flatMap(_.toDoubleOption)
    .getOrElse(DefaultSqRetrainClipFrac)

  /** Evaluate the LATEST committed segment's drift ([[sqDriftMetrics]])
    * against the retrain threshold and rebuild if it trips — the
    * explicit form of the trigger [[sqAppendIndex]] runs inline per
    * batch (which costs no extra scan; this one scans the view and is
    * for deployments that alert on the q229 metrics out-of-band).
    * Returns whether a retrain ran.
    */
  def sqMaybeRetrain(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      sourceTag: String = "",
      retrainClipFrac: Option[Double] = None): Boolean = {
    val segs = sqDriftMetrics(spark, path, sourceTag).collect()
    if (segs.length <= 1) return false // base only: nothing appended
    val latest = segs.maxBy(_.getAs[Int]("seg"))
    if (latest.getAs[Double]("clip_frac") <=
        retrainClipFrac.getOrElse(sqRetrainClipFracThreshold))
      return false
    sqRetrain(spark, path)
    true
  }

  /** Rebuild the SQ index from its own committed view with FRESH
    * per-dim bounds — retrain = the [[AtomicAppend.compact]] fold
    * with re-trained quantizer state: the new codes AND the new
    * `_meta` publish inside one `_seg-c<n>` under one marker (see
    * [[sqMetaPath]] — every crash window leaves either the old
    * codes+bounds or the new codes+bounds, never a mix), covered legs
    * vacuum under the usual grace. The full-precision `v` column
    * makes the retrain exact: re-encoding loses nothing that wasn't
    * already lost at ingest. `carryMeta = Nil` — a prior retrain
    * fold's stale `_meta` must not clobber the fresh one.
    */
  def sqRetrain(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val prior = spark.read.parquet(sqMetaPath(spark, path)).head()
    val src =
      if (prior.schema.fieldNames.contains("source"))
        prior.getAs[String]("source")
      else ""
    AtomicAppend.compact(spark, path, carryMeta = Nil) { (d, staging) =>
      val (q8, bounds) = quantizeInt8(d.select(col("id"), col("v")), "v")
      q8.select(col("id"), col("v_q8").as("q8"), col("v"))
        .write
        .mode("overwrite")
        .parquet(staging)
      bounds
        .select(col("lo"), col("hi"), lit(src).as("source"))
        .write
        .mode("overwrite")
        .parquet(s"$staging/_meta")
    }
  }

  /** Occupancy-drift retrain DECISION for the frozen-coarse-quantizer
    * families (IVF / IVF-PQ — [[clusterOccupancyDrift]]'s consumers):
    * segments whose occupancy distribution diverges from the base
    * build's past the thresholds (total-variation distance, or a
    * single cluster absorbing most of the segment — the shape that
    * breaks nprobe's scan bound). Returns the tripped (seg, tv,
    * max_share) rows; empty = the frozen centroids still fit. The
    * REBUILD is [[ivfRetrain]] (k-means re-run from the committed
    * view's full-precision vectors, published as ONE compact fold) —
    * [[ivfMaybeRetrain]] wires this decision to it the way
    * [[sqMaybeRetrain]] wires clip-frac to [[sqRetrain]]. Defaults:
    * tv 0.5 (half the segment's mass sits in cells the base didn't
    * use at that rate), max share 0.5 (half the segment in one cell);
    * override per call via `tvBar`/`shareBar` (the race-free form) or
    * process-wide via `graft.ivf.retrain.tv` /
    * `graft.ivf.retrain.maxshare`.
    */
  def occupancyRetrainNeeded(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      tvBar: Option[Double] = None,
      shareBar: Option[Double] = None): Array[org.apache.spark.sql.Row] = {
    val tv = tvBar.getOrElse(
      sys.props
        .get("graft.ivf.retrain.tv")
        .flatMap(_.toDoubleOption)
        .getOrElse(0.5))
    val share = shareBar.getOrElse(
      sys.props
        .get("graft.ivf.retrain.maxshare")
        .flatMap(_.toDoubleOption)
        .getOrElse(0.5))
    clusterOccupancyDrift(spark, path)
      .where(col("seg") > 0 &&
        (col("tv_vs_base") > tv || col("max_cluster_share") > share))
      .collect()
  }

  /** Where the CURRENT coarse-centroid table of an IVF / IVF-PQ index
    * lives: a retrain fold publishes the re-trained centroids INSIDE
    * its `_seg-c<n>` corpus directory (the [[sqMetaPath]] discipline —
    * the re-partitioned corpus and the quantizer that produced it
    * switch under ONE commit marker; a root rewrite would leave a
    * crash window where probes rank clusters against centroids the
    * corpus layout no longer matches), and regular compaction carries
    * the copy forward. A never-retrained index keeps its build-time
    * root `centroids` table.
    */
  private[operators] def ivfCentroidsPath(
      spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    AtomicAppend
      .latestSegFile(spark, s"$path/corpus", "_centroids")
      .getOrElse(s"$path/centroids")

  /** Rebuild an IVF index's coarse quantizer from its own committed
    * corpus view — the occupancy-drift twin of [[sqRetrain]], acting
    * on the q230 metrics: re-run [[kmeansAssign]] over the stored
    * full-precision vectors with the build-recorded parameters
    * (`kmeans_k`/`kmeans_iters` in `_meta`, written by
    * [[ivfWriteIndexKmeans]] — a retrain that needs a human to
    * remember k is half a feature; pass `k` explicitly for a
    * label-built index, which records none), re-partition the corpus
    * by the NEW assignment, and publish corpus + centroids as ONE
    * [[AtomicAppend.compact]] fold whose staging carries the fresh
    * `_centroids` — every crash window leaves either the old corpus +
    * old centroids or the new pair, never a mix. Probe mechanics are
    * unchanged (`cluster IN` partition pruning per leg); the stale
    * root `centroids` table becomes unreachable through
    * [[ivfCentroidsPath]]. No-op before the first append (compact
    * has nothing to fold — and occupancy drift needs a segment to
    * measure, so the trigger can never fire there either).
    */
  def ivfRetrain(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      k: Option[Int] = None,
      iters: Option[Int] = None): Unit = {
    val meta = spark.read.parquet(s"$path/_meta").head()
    def metaInt(n: String): Option[Int] =
      if (meta.schema.fieldNames.contains(n) &&
        !meta.isNullAt(meta.fieldIndex(n)))
        Some(meta.getAs[Number](n).intValue)
      else None
    val kk = k
      .orElse(metaInt("kmeans_k"))
      .getOrElse(throw new IllegalArgumentException(
        s"IVF index at $path records no k-means build parameters " +
          "(label-built, or built before they were recorded) — pass k " +
          "explicitly"))
    val it = iters.orElse(metaInt("kmeans_iters")).getOrElse(3)
    AtomicAppend.compact(spark, s"$path/corpus", carryMeta = Nil) {
      (d, staging) =>
        val assigned = graft.ops.Stage.materializeOnce(
          kmeansAssign(d.select(col("id"), col("v")), "v", "id", kk, it))
        assigned
          .select(col("id"), col("v"), col("cluster"))
          .write
          .mode("overwrite")
          .partitionBy("cluster")
          .parquet(staging)
        ivfCentroids(assigned, "v", "cluster")
          .write
          .mode("overwrite")
          .parquet(s"$staging/_centroids")
    }
  }

  /** Evaluate occupancy drift ([[occupancyRetrainNeeded]]) and rebuild
    * if tripped — [[sqMaybeRetrain]] for the frozen-coarse-quantizer
    * family. Returns whether a retrain ran.
    */
  def ivfMaybeRetrain(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      k: Option[Int] = None,
      iters: Option[Int] = None,
      tvBar: Option[Double] = None,
      shareBar: Option[Double] = None): Boolean =
    if (occupancyRetrainNeeded(spark, path, tvBar, shareBar).isEmpty) false
    else {
      ivfRetrain(spark, path, k, iters)
      true
    }

  /** Per-row count of vector components outside the frozen [lo, hi]
    * bounds — exactly the components [[sqEnc]] saturates. Shared by
    * [[sqDriftMetrics]] (per-segment clip_frac) and the append path's
    * inline retrain trigger (batch clip_frac, zero extra actions).
    */
  private[graft] def sqClipSum(lo: Seq[Double], hi: Seq[Double])(v: Column): Column =
    aggregate(
      zip_with(
        zip_with(v, array(lo.map(lit): _*),
          (x, l) => struct(x.as("x"), l.as("l"))),
        array(hi.map(lit): _*),
        (xl, h) =>
          when(
            xl.getField("x") < xl.getField("l") || xl.getField("x") > h,
            lit(1d)).otherwise(lit(0d))),
      lit(0d),
      (a, e) => a + e)

  /** Where the CURRENT SQ `_meta` lives: a retrain fold publishes the
    * re-trained bounds INSIDE its `_seg-c<n>` directory (so codes and
    * bounds switch under ONE commit marker — a root-`_meta` rewrite
    * after the fold would leave a crash window where new codes
    * dequantize under old bounds, silently scrambling every probe's
    * candidate ranking); a never-retrained index keeps its build-time
    * root `_meta`. [[AtomicAppend.latestSegFile]] resolves the newest
    * carried copy, so regular compaction keeps the retrained bounds
    * flowing forward (the BM25 stats discipline).
    */
  private def sqMetaPath(
      spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    AtomicAppend.latestSegFile(spark, path, "_meta").getOrElse(s"$path/_meta")

  /** Validate + load a [[sqWriteIndex]] `_meta`: returns the per-dim
    * (lo, hi) quantization bounds. Shared by both probes — one copy of
    * the source-identity check and the bounds extraction.
    */
  private def sqReadMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      sourceTag: String): (Seq[Double], Seq[Double]) = {
    val m = spark.read.parquet(sqMetaPath(spark, path)).head()
    checkSource(
      "SQ",
      path,
      if (m.schema.fieldNames.contains("source")) m.getAs[String]("source")
      else "",
      sourceTag)
    (m.getSeq[Double](m.fieldIndex("lo")),
      m.getSeq[Double](m.fieldIndex("hi")))
  }

  /** Quantize a vector column under driver-held bounds — the append-
    * side twin of [[sqDeq]], in IEEE lockstep with [[quantizeInt8]]'s
    * in-plan form (same `(x−lo)·255/range` association, same
    * round-half-up, same −128 shift) PLUS a [0, 255] clamp: the build
    * path never needs one (its bounds are the corpus min/max by
    * construction), but an APPENDED batch may carry components outside
    * the frozen bounds, and an unclamped `cast("tinyint")` would WRAP
    * (e.g. 300−128 → −84), scrambling the candidate ranking instead of
    * saturating it. For in-bounds components the clamp is the
    * identity, so appended codes are bit-identical to what a build
    * over the union WITH THE SAME BOUNDS would produce — the q224
    * oracle contract.
    */
  private def sqEnc(lo: Seq[Double], hi: Seq[Double])(v: Column): Column =
    zip_with(
      zip_with(v, array(lo.map(lit): _*), (x, l) => x - l),
      array(hi.indices.map(i => lit(hi(i) - lo(i))): _*),
      (num, range) =>
        (greatest(
          lit(0d),
          least(
            lit(255d),
            when(range === 0d, lit(0d))
              .otherwise(round(num * 255d / range)))) - 128)
          .cast("tinyint"))

  /** Dequantize an int8-codes column under driver-held bounds — the
    * ONE probe-side copy of the affine formula. It must stay in IEEE
    * lockstep with [[dequantizeInt8]] (the in-plan form the inline
    * [[sqTopK]] uses): same `lo + (q+128)·range/255` association, the
    * `range` literal computed as the same double subtraction — the
    * probe==inline hash contracts (q219/q220/q221) ride on this.
    */
  private[graft] def sqDeq(lo: Seq[Double], hi: Seq[Double])(q8: Column): Column =
    zip_with(
      zip_with(q8, array(lo.map(lit): _*),
        (q, l) => struct(q.as("q"), l.as("l"))),
      array(hi.indices.map(i => lit(hi(i) - lo(i))): _*),
      (ql, range) =>
        ql.getField("l") +
          (ql.getField("q").cast("int") + 128) * range / 255d)

  /** Probe a persisted [[sqWriteIndex]] layout — bit-identical to the
    * inline [[sqTopK]] (same bounds since they were computed from the
    * same corpus at build, same dequantize arithmetic, same 6-decimal
    * round-before-rank cuts with id tiebreaks), but with the
    * build-once/probe-many cost profile: the candidate scan reads ONLY
    * (id, q8) — the parquet reader never materializes the float
    * vectors — and the rescore reads (id, q8, v) restricted to the
    * ≤ factor·k candidates via [[IndexProbe.restrictByKeys]]: a pushed
    * `id IN (…)` predicate (row-group skipping) for ordinary k, a
    * broadcast semi-join of the candidate frame past the literal cap
    * (bounded by construction either way — the restriction is the
    * probe's own k-scaled output size, never the corpus).
    */
  def sqProbeIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Seq[Double],
      k: Int,
      factor: Int = 4,
      sourceTag: String = ""): DataFrame = {
    require(k > 0 && factor >= 1)
    val (lo, hi) = sqReadMeta(spark, path, sourceTag)
    VectorExpressions.register(spark)
    // fused dequantize (round 17, [[graft.functions.SqDequantizeExpr]]
    // — bit-parity with the kept composable [[sqDeq]], spec'd in
    // ExtensionsSpec): the interpreted two-pass zip_with battery ran
    // per row of the candidate scan
    val deq = (c: org.apache.spark.sql.Column) =>
      graft.functions.SqExpressions.dequantize(c, lo, hi)
    val idx = AtomicAppend.read(spark, path)
    val cand = idx
      .select(
        col("id"),
        round(VectorExpressions.cosineFast(deq(col("q8")), vecLit(query)), 6)
          .as("sim_q8"))
      .orderBy(col("sim_q8").desc, col("id").asc)
      .limit(factor * k)
      .select("id")
    IndexProbe
      .restrictByKeys(idx, "id", cand, factor.toLong * k)
      .select(
        col("id"),
        round(VectorExpressions.cosineFast(deq(col("q8")), vecLit(query)), 6)
          .as("sim_q8"),
        round(VectorExpressions.cosineFast(col("v"), vecLit(query)), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Many-queries probe of a persisted [[sqWriteIndex]] layout — the
    * [[lshProbeIndexMany]] discipline on the SQ index: ONE scan of the
    * int8 codes column scores every (vector, query) pair against the
    * BROADCAST query batch (collected once to the driver — bounded by
    * the batch, and it pins the query count for the restriction-path
    * choice without an extra job), per-query candidate rank cuts at
    * factor·k, and the rescore reads the candidate rows once,
    * restricted via [[IndexProbe.restrictByKeys]] over the union of
    * all queries' candidate ids (≤ nQueries·factor·k — bounded by the
    * probe's own output size): a pushed id-IN predicate for small
    * batches, a broadcast semi-join of the candidate frame past the
    * literal cap (a 1k-query batch at k=10, factor=4 would otherwise
    * bake a 40k-literal In-list into the plan). Per-query cuts use the
    * same 6-decimal round-before-rank + id tiebreak as [[sqTopK]], so
    * each query's rows equal its single-probe answer and the SQL
    * oracle replays the batch bit-for-bit.
    */
  def sqProbeIndexMany(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      k: Int,
      factor: Int = 4,
      sourceTag: String = ""): DataFrame = {
    require(k > 0 && factor >= 1)
    val (lo, hi) = sqReadMeta(spark, path, sourceTag)
    VectorExpressions.register(spark)
    // fused dequantize (round 17, [[graft.functions.SqDequantizeExpr]]
    // — bit-parity with the kept composable [[sqDeq]], spec'd in
    // ExtensionsSpec): the interpreted two-pass zip_with battery ran
    // per row of the candidate scan
    val deq = (c: org.apache.spark.sql.Column) =>
      graft.functions.SqExpressions.dequantize(c, lo, hi)
    // one collect of the (small) query batch: the local relation
    // broadcasts into BOTH the candidate and rescore joins without
    // re-running the caller's query subplan per action, and its length
    // is the static bound the restriction-path choice needs
    val qSel = queries.select(
      col(qIdCol).as("query_id"),
      col(qVecCol).cast("array<double>").as("__qv"))
    val qRows = qSel.collect()
    val qs = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qSel.schema)
    val idx = AtomicAppend.read(spark, path)
    val simQ8 =
      round(VectorExpressions.cosineFast(deq(col("q8")), col("__qv")), 6)
    val cand = IndexProbe
      .perQueryTopK(
        idx
          .select(col("id"), col("q8"))
          .join(broadcast(qs))
          .select(col("query_id"), col("id"), simQ8.as("sim_q8")),
        factor * k,
        col("sim_q8").desc,
        col("id").asc)
      .select("id")
    val restricted = IndexProbe
      .restrictByKeys(idx, "id", cand, qRows.length.toLong * factor * k)
      .join(broadcast(qs))
      .select(
        col("query_id"),
        col("id"),
        simQ8.as("sim_q8"),
        round(VectorExpressions.cosineFast(col("v"), col("__qv")), 6)
          .as("sim"))
    // per-query re-cut at factor·k: the restriction is the UNION of
    // all queries' candidates, and each query must rescore only its
    // own (its corpus-wide top factor·k is a subset of the union, so
    // the re-cut reproduces it exactly)
    val reCut = IndexProbe.perQueryTopK(
      restricted, factor * k, col("sim_q8").desc, col("id").asc)
    IndexProbe
      .perQueryTopK(reCut, k, col("sim").desc, col("id").asc)
      .select("query_id", "id", "sim_q8", "sim")
  }

  /** Per-segment DRIFT metrics for a frozen-quantizer SQ index — the
    * number a production deployment triggers the documented
    * retrain-=-rebuild on (the frozen-bounds evolution of
    * [[sqAppendIndex]] degrades recall gracefully as the corpus
    * drifts, but nothing measured the drift until now). One
    * aggregation over the committed segment view
    * ([[AtomicAppend.readWithSeg]] — base = seg 0, each append its
    * segment id), emitting per segment:
    *
    *  - `n` — vectors in the segment;
    *  - `avg_abs_err` — mean per-component absolute quantization
    *    error |v − dequant(code)| under the index's FROZEN bounds
    *    (distortion: for the build segment this is the irreducible
    *    half-step noise; a drifted append's error grows with how far
    *    its values sit outside the frozen grid);
    *  - `clip_frac` — fraction of components outside [lo, hi] (the
    *    components [[sqEnc]] saturated; exact integer counts, so the
    *    ratio is deterministic across engines).
    *
    * Pure arithmetic over STORED codes/vectors + `_meta` bounds —
    * SQL-replayable (the q224 oracle's bounds/clamp/dequantize CTEs,
    * aggregated instead of ranked), hence a hash-green declared query
    * (q229). Scale: one scan of (q8, v), one `__seg` aggregation;
    * no joins, no driver collect.
    */
  def sqDriftMetrics(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      sourceTag: String = ""): DataFrame = {
    val (lo, hi) = sqReadMeta(spark, path, sourceTag)
    val dims = lo.length.toDouble
    // fused per-row drift terms (round 17,
    // [[graft.functions.SqDriftTermsExpr]] — one pass instead of the
    // interpreted zip_with/aggregate lambda battery; bit-parity with
    // the kept composable forms, spec'd in ExtensionsSpec)
    AtomicAppend
      .readWithSeg(spark, path)
      .select(
        col("__seg"),
        graft.functions.SqExpressions
          .driftTerms(col("q8"), col("v"), lo, hi)
          .as("__t"))
      .groupBy(col("__seg"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__t.err_sum")).as("__es"),
        sum(col("__t.clip_sum")).as("__cs"))
      .select(
        col("__seg").cast("int").as("seg"),
        col("n"),
        round(col("__es") / (col("n") * dims), 6).as("avg_abs_err"),
        round(col("__cs") / (col("n") * dims), 6).as("clip_frac"))
      .orderBy("seg")
  }

  /** Per-segment cluster-OCCUPANCY drift for the frozen-coarse-
    * quantizer index families (IVF and IVF-PQ both lay their corpus
    * out partitioned by `cluster` under `path/corpus`, and both
    * freeze centroids on append — lists grow, cells don't move, so
    * the one signal that the frozen quantizer no longer fits the data
    * is WHERE the appended vectors land): per committed segment,
    * the total-variation distance between the segment's cluster-
    * occupancy distribution and the BASE build's (0 = identically
    * distributed, 1 = disjoint support), plus the segment's largest
    * single-cluster share (an in-distribution append spreads like the
    * base; a drifted one piles into few cells, which is also exactly
    * what degrades probe cost — nprobe lists stop bounding the scan).
    *
    * All counts — exact integer arithmetic, deterministic. The
    * per-(segment, cluster) count frame is bounded by
    * segments × nclusters (never corpus-sized); the occupancy grid
    * completes missing (segment, cluster) cells with an explicit
    * bounded cross of those two tiny distinct frames. Not SQL-
    * replayable as a declared query (cluster assignment rides the
    * k-means-trained centroids), so spec-pinned: a deliberately
    * shifted append moves the metric, an in-distribution one doesn't
    * (DriftSpec).
    */
  def clusterOccupancyDrift(
      spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    // counts is consumed FOUR times below (grid's two distinct sides,
    // the fill join, the base-share self-join) — unstaged, each
    // consumer re-reads every committed leg and re-aggregates, so the
    // plan held 4x the corpus scans and a dozen broadcast-build jobs
    // (profiled: ~1.1 s steady at sf0.1, almost all scheduler/footer
    // overhead). Materialize the tiny (segments x nclusters)-bounded
    // frame once; everything downstream is arithmetic over it
    val counts = graft.ops.Stage.materializeOnce(
      AtomicAppend
        .readWithSeg(spark, s"$path/corpus")
        .groupBy(col("__seg"), col("cluster"))
        .agg(count(lit(1)).as("__c")))
    // segments × clusters grid: both sides are tiny DISTINCT frames
    // (bounded by append count and k respectively), so the cross is a
    // bounded constant-attach, not a corpus cartesian
    val grid = counts
      .select("__seg")
      .distinct()
      .crossJoin(broadcast(counts.select("cluster").distinct()))
    val filled = grid
      .join(counts, Seq("__seg", "cluster"), "left")
      .na
      .fill(0L, Seq("__c"))
    // two consumers again (the base-share slice and the main side) —
    // lazy-stage so the grid+fill+window subtree appears once in the
    // plan instead of twice (still tiny data; this trims plan size and
    // driver round trips, not bytes)
    val withShare = graft.ops.Stage.materializeLazy(
      filled
        .withColumn(
          "__share",
          col("__c") / sum(col("__c")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("__seg"))))
    val base = withShare
      .where(col("__seg") === 0L)
      .select(col("cluster"), col("__share").as("__base_share"))
    withShare
      .join(broadcast(base), Seq("cluster"))
      .groupBy(col("__seg"))
      .agg(
        sum(col("__c")).as("n"),
        round(
          sum(abs(col("__share") - col("__base_share"))) / 2d,
          6).as("tv_vs_base"),
        round(max(col("__share")), 6).as("max_cluster_share"))
      .select(
        col("__seg").cast("int").as("seg"),
        col("n"),
        col("tv_vs_base"),
        col("max_cluster_share"))
      .orderBy("seg")
  }

  /** LSH-bucketed approximate top-k: score only vectors sharing at least
    * one signature band with the query.
    *
    * @param bandBits bits per band; bands = nBits/bandBits
    */
  def lshTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Double],
      k: Int,
      nBits: Int = 16,
      bandBits: Int = 4): DataFrame = {
    require(nBits % bandBits == 0, "bandBits must divide nBits")
    val bands = nBits / bandBits
    val mask = (1L << bandBits) - 1

    // query signature computed once (tiny driver-side job — must use the
    // same Murmur3-based expression as the corpus side), then baked in as
    // literal band keys in the SAME (band, bk) struct encoding as
    // [[bandKeys]] — one band-key layout for transient and persisted
    // paths alike, so a layout change cannot silently diverge
    val qSigVal: Long = df.sparkSession
      .range(1)
      .select(VectorFunctions.hyperplaneSignature(vecLit(query), nBits))
      .head()
      .getLong(0)
    val qBands = array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        lit(((qSigVal >> (b * bandBits)) & mask).toInt).as("bk"))
    }: _*)

    // signature staged to a real column: bandKeys references it `bands`
    // times, and an inlined signature expression would re-run the full
    // hyperplane projection per band (see TextFunctions.shinglesOf note)
    df.select(
        col(idCol).as("id"),
        col(vecCol).as("v"),
        VectorFunctions.hyperplaneSignature(col(vecCol), nBits).as("__sig"))
      .select(
        col("id"),
        col("v"),
        bandKeys(col("__sig"), nBits, bandBits).as("vb"))
      .where(size(array_intersect(col("vb"), qBands)) > 0)
      .select(
        col("id"),
        cos(df)(col("v"), vecLit(query)).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** One struct (band, bk) per LSH band of a signature column — the
    * band-key encoding that index write and probes MUST share (a single
    * definition so a layout change cannot silently diverge).
    */
  private def bandKeys(sig: Column, nBits: Int, bandBits: Int): Column = {
    val bands = nBits / bandBits
    val mask = (1L << bandBits) - 1
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        shiftright(sig, b * bandBits)
          .bitwiseAND(lit(mask))
          .cast("int")
          .as("bk"))
    }: _*)
  }

  /** Validate that a persisted LSH index was built with the probe's
    * (nBits, bandBits) — a mismatch would otherwise return silently
    * wrong candidates (wrong bucket directories), not an error.
    */
  private def checkLshMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      nBits: Int,
      bandBits: Int,
      sourceTag: String): Unit = {
    val m = spark.read.parquet(s"$path/_meta").head()
    val (wn, wb) = (m.getAs[Int]("nBits"), m.getAs[Int]("bandBits"))
    require(
      wn == nBits && wb == bandBits,
      s"LSH index at $path was built with nBits=$wn bandBits=$wb; " +
        s"probe requested nBits=$nBits bandBits=$bandBits")
    // pre-source indexes have no `source` field — treat as anonymous
    val built =
      if (m.schema.fieldNames.contains("source")) m.getAs[String]("source") else ""
    checkSource("LSH", path, built, sourceTag)
  }

  /** Source-identity check shared by the index formats: an index probed
    * with the wrong `sourceTag` (e.g. a cache path collision between two
    * data dirs) would return silently wrong neighbors, not an error.
    * Empty tag on either side skips the check (anonymous index).
    */
  private def checkSource(
      kind: String,
      path: String,
      built: String,
      probed: String): Unit =
    require(
      probed.isEmpty || built == null || built.isEmpty || built == probed,
      s"$kind index at $path was built from source '$built'; " +
        s"probe expected source '$probed' — refusing to cross-wire indexes")

  /** IVF `source` from `_meta`, treating indexes written before `_meta`
    * existed as anonymous (same grace as [[checkLshMeta]]'s missing-field
    * branch — a tagged probe of an old index must not crash).
    */
  private def ivfBuiltSource(
      spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    try {
      val m = spark.read.parquet(s"$path/_meta").head()
      if (m.schema.fieldNames.contains("source")) m.getAs[String]("source")
      else ""
    } catch {
      case _: org.apache.spark.sql.AnalysisException => ""
    }

  /** Persist the build-once LSH index: the corpus exploded into one row
    * per (band, band-key) bucket — the standard inverted-index-per-band
    * layout (data duplicated `bands` times, the classic LSH trade) —
    * PARTITIONED BY (band, bk) so a probe reads exactly `bands` bucket
    * directories instead of scanning + re-signing the corpus per query.
    * Build parameters are recorded in `_meta` (hidden from the corpus
    * read) and validated by the probes.
    */
  def lshWriteIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      nBits: Int = 16,
      bandBits: Int = 4,
      sourceTag: String = ""): Unit = {
    require(nBits % bandBits == 0, "bandBits must divide nBits")
    df.select(
        col(idCol).as("id"),
        col(vecCol).as("v"),
        VectorFunctions.hyperplaneSignature(col(vecCol), nBits).as("__sig"))
      .select(
        col("id"),
        col("v"),
        explode(bandKeys(col("__sig"), nBits, bandBits)).as("e"))
      .select(col("id"), col("v"), col("e.band"), col("e.bk"))
      .write
      .mode("overwrite")
      .partitionBy("band", "bk")
      .parquet(path)
    df.sparkSession
      .range(1)
      .select(
        lit(nBits).as("nBits"),
        lit(bandBits).as("bandBits"),
        lit(sourceTag).as("source"))
      .write
      .mode("overwrite")
      .parquet(s"$path/_meta")
  }

  /** Incremental LSH index maintenance — append a new batch into a
    * persisted [[lshWriteIndex]] layout. The easiest member of the
    * index-evolution family (IVF freezes centroids, SQ freezes bounds,
    * BM25 merges stats): hyperplane signatures are DATA-INDEPENDENT
    * (seeded hashes of the vector alone), so there is nothing to
    * freeze and nothing to merge — the appended rows are byte-for-byte
    * the rows a full rebuild would produce for those ids, at any batch
    * split, forever. The band geometry (nBits, bandBits) is READ FROM
    * `_meta`, not taken as parameters — the index already records the
    * only correct values, and a caller-supplied mismatch could only
    * ever be a refusal (or, unchecked, a batch scattered into
    * directories no probe reads); `_meta` itself is left untouched.
    * Crash-atomic via [[AtomicAppend.publish]]; same duplicate-id
    * contract as every other append path.
    */
  def lshAppendIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      sourceTag: String = ""): Unit = {
    val m = df.sparkSession.read.parquet(s"$path/_meta").head()
    val nBits = m.getAs[Int]("nBits")
    val bandBits = m.getAs[Int]("bandBits")
    checkSource(
      "LSH",
      path,
      if (m.schema.fieldNames.contains("source")) m.getAs[String]("source")
      else "",
      sourceTag)
    AtomicAppend.publish(df.sparkSession, path) { staging =>
      df.select(
          col(idCol).as("id"),
          col(vecCol).as("v"),
          VectorFunctions.hyperplaneSignature(col(vecCol), nBits).as("__sig"))
        .select(
          col("id"),
          col("v"),
          explode(bandKeys(col("__sig"), nBits, bandBits)).as("e"))
        .select(col("id"), col("v"), col("e.band"), col("e.bk"))
        .write
        .mode("overwrite")
        .partitionBy("band", "bk")
        .parquet(staging)
    }
    // auto-fold: rows rewrite as stored (signatures are data-
    // independent), same (band, bk) bucket-directory layout
    AtomicAppend.maybeCompact(df.sparkSession, path) { (d, staging) =>
      d.write.mode("overwrite").partitionBy("band", "bk").parquet(staging)
    }
  }

  /** XOR flip masks enumerating the Hamming ball of radius `radius`
    * over `bits`-bit keys: `bk ^ mask` for every mask with
    * popcount ≤ radius IS the ball around bk — one mask list serves
    * every key (driver-side literals for the single probe, an exploded
    * in-plan array for the batch probe). Radius 0 → Seq(0) (exact
    * probing, the default everywhere).
    */
  private def hammingMasks(bits: Int, radius: Int): Seq[Int] = {
    require(radius >= 0 && radius <= bits,
      s"probe radius must be in [0, $bits], got $radius")
    if (radius == 0) Seq(0)
    else {
      // `1 << bits` overflows at 31 and a full-range popcount scan is
      // 2^bits driver work — enumerate bit-position combinations
      // instead (Σ C(bits, r) masks, the ball size itself)
      require(bits <= 30, s"multi-probe supports bandBits <= 30, got $bits")
      def combs(start: Int, left: Int): Seq[Int] =
        if (left == 0) Seq(0)
        else (start until bits).flatMap(p =>
          combs(p + 1, left - 1).map(_ | (1 << p)))
      (0 to radius).flatMap(r => combs(0, r)).distinct
    }
  }

  /** Probe a persisted [[lshWriteIndex]] layout: the query signature is
    * computed once (tiny job), then `bands` (band, bk) equality
    * predicates prune to the matching bucket directories. Candidates are
    * deduped (a vector can collide in several bands) and scored exactly.
    *
    * MULTI-PROBE (`probeRadius` > 0): each band also probes every
    * bucket within Hamming distance `probeRadius` of the query's band
    * key (Lv et al., VLDB 2007's insight, Hamming-ball flavor: a near
    * neighbor that missed the exact bucket almost certainly sits in one
    * that differs by a bit or two). Recall rises WITHOUT rebuilding or
    * widening the index — the trade every production ANN service wants:
    * radius 1 reads bands·(1+bandBits) bucket directories instead of
    * `bands`, still partition-pruned, still a vanishing fraction of the
    * corpus; more hash tables would instead multiply the INDEX, i.e.
    * storage and build time, at 100 TB.
    */
  def lshProbeIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Seq[Double],
      k: Int,
      nBits: Int = 16,
      bandBits: Int = 4,
      sourceTag: String = "",
      probeRadius: Int = 0): DataFrame = {
    require(nBits % bandBits == 0, "bandBits must divide nBits")
    checkLshMeta(spark, path, nBits, bandBits, sourceTag)
    val bands = nBits / bandBits
    val mask = (1L << bandBits) - 1
    val masks = hammingMasks(bandBits, probeRadius)
    val qSig: Long = spark
      .range(1)
      .select(VectorFunctions.hyperplaneSignature(vecLit(query), nBits))
      .head()
      .getLong(0)
    val pred = (0 until bands)
      .map { b =>
        val bk = ((qSig >> (b * bandBits)) & mask).toInt
        col("band") === b && col("bk").isin(masks.map(bk ^ _): _*)
      }
      .reduce(_ || _)
    val cand = AtomicAppend.read(spark, path).where(pred).dropDuplicates("id")
    bruteForceTopK(cand, "v", "id", query, k)
  }

  /** Many-queries probe of a persisted [[lshWriteIndex]] layout: each
    * query's band keys join the index on (band, bk) — ONE equi-join for
    * the whole query batch instead of per-query scans, and the corpus is
    * never re-signed. The query side is broadcast (query batches are
    * small by assumption, same as [[crossTopK]]); candidates dedupe on
    * (query, id) before exact scoring + per-query window top-k.
    * This is the 100-TB shape for batch ANN: index once, join probes.
    * `probeRadius` > 0 multi-probes exactly as in [[lshProbeIndex]]:
    * the flip-mask array cross-applies in-plan (bk ^ mask enumerates
    * each key's Hamming ball), so the broadcast query side grows by
    * the ball size, never the index side.
    */
  def lshProbeIndexMany(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      k: Int,
      nBits: Int = 16,
      bandBits: Int = 4,
      sourceTag: String = "",
      probeRadius: Int = 0): DataFrame = {
    require(nBits % bandBits == 0, "bandBits must divide nBits")
    checkLshMeta(spark, path, nBits, bandBits, sourceTag)
    val masks = hammingMasks(bandBits, probeRadius)
    val qb = queries
      .select(
        col(qIdCol).as("query_id"),
        col(qVecCol).as("qv"),
        VectorFunctions.hyperplaneSignature(col(qVecCol), nBits).as("__sig"))
      .select(
        col("query_id"),
        col("qv"),
        explode(bandKeys(col("__sig"), nBits, bandBits)).as("e"))
      .select(
        col("query_id"),
        col("qv"),
        col("e.band"),
        // XOR against distinct masks is injective, so the probed
        // (band, bk) keys are distinct by construction — no dedup
        // (an aggregate here would put an exchange in front of the
        // broadcast for nothing)
        explode(array(masks.map(m => col("e.bk").bitwiseXOR(lit(m))): _*))
          .as("bk"))
    VectorExpressions.register(spark)
    val scored = AtomicAppend
      .read(spark, path)
      .join(broadcast(qb), Seq("band", "bk"))
      .dropDuplicates("query_id", "id")
      .select(
        col("query_id"),
        col("id"),
        VectorExpressions.cosineFast(col("v"), col("qv")).as("sim"))
    IndexProbe.perQueryTopK(scored, k, col("sim").desc, col("id").asc)
  }

  /** IVF (inverted-file) index build: per-cluster element-wise centroid
    * of the embedding column. posexplode + (cluster, dim) aggregation —
    * partial+final, one exchange carrying (cluster, dim, partial sums);
    * output is centroids as rows (cluster, pos, v), trivially joinable
    * and engine-portable. Any coarse assignment works as `clusterCol`
    * (k-means round, label, LSH bucket).
    */
  def ivfCentroids(df: DataFrame, vecCol: String, clusterCol: String): DataFrame =
    df.select(col(clusterCol).as("cluster"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy("cluster", "pos")
      .agg(avg(col("col")).as("v"))

  /** Nearest-centroid assignment against a driver-side centroid table
    * — since round 17 the HOT path is [[graft.functions
    * .NearestCentroidExpr]] (direct ArrayData walk; the ScalaUDF
    * converted every vector to a boxed Seq[Double] per row, a real
    * cost on every IVF-family index BUILD, which the bench times in
    * `index_build`). This UDF form is KEPT as the executable
    * SPECIFICATION the fused expression is differenced against
    * (ExtensionsSpec parity: identical loop order, strict `<`
    * tie-break, min(dims) guard — assignments bit-identical). The
    * centroids are plan constants either way (a few KB riding in the
    * expression), so there is NO join and NO shuffle: assignment is a
    * narrow map over the corpus.
    */
  private[graft] def nearestCentroid(
      centroids: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Double]) =>
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val ct = centroids(c)
        var d = 0.0
        var i = 0
        val n = math.min(ct.length, v.length)
        while (i < n) { val x = v(i) - ct(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

  /** Deterministic k-means over an embedding column — the coarse
    * quantizer that lets the IVF path build on UNLABELED corpora (a real
    * pretraining corpus has no `label`; without this, [[ivfWriteIndex]]
    * needs a cluster column from somewhere else).
    *
    * Shape per Lloyd round (classic distributed k-means, nothing novel):
    *  1. assignment — [[nearestCentroid]] narrow map, no shuffle;
    *  2. re-average — [[ivfCentroids]]' posexplode + (cluster, pos)
    *     partial+final aggregation: ONE exchange carrying k·dim partial
    *     sums per upstream partition, never the vectors;
    *  3. the k·dim centroid table collects to the driver (bounded,
    *     independent of corpus size) and feeds the next round's constant.
    * Seeds are the k vectors with the smallest xxhash64(id) — a
    * deterministic hash-sample (no RNG: same corpus → same clustering,
    * any cluster size, any partitioning; planned as TakeOrdered, k rows
    * to the driver). Empty clusters keep their previous centroid. Few
    * rounds suffice for a COARSE quantizer — cells only gate which
    * corpus partitions a probe reads; exact scoring happens inside them.
    *
    * @return `df` plus an integer `cluster` column in [0, k)
    */
  def kmeansAssign(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val vecs = df.select(
      col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    var centroids: Array[Array[Double]] = vecs
      .select(col("v"), xxhash64(col("id")).as("h"))
      .orderBy(col("h"), col("id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val assigned = vecs.withColumn(
        "cluster",
        graft.functions.NearestCentroidExpr.ofColumn(col("v"), centroids))
      val updated = ivfCentroids(assigned, "v", "cluster")
        .collect()
        .groupBy(_.getAs[Int]("cluster"))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("v"))
        }
      centroids = centroids.indices
        .map(c => updated.getOrElse(c, centroids(c)))
        .toArray
    }
    df.withColumn(
      "cluster",
      graft.functions.NearestCentroidExpr
        .ofColumn(col(vecCol).cast("array<double>"), centroids))
  }

  /** [[ivfWriteIndex]] for an UNLABELED corpus: run [[kmeansAssign]] for
    * the coarse assignment, then write the same partitioned layout. The
    * assigned frame is materialized once — it feeds both the corpus
    * write and the centroid aggregation.
    */
  def ivfWriteIndexKmeans(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      k: Int,
      iters: Int = 3,
      sourceTag: String = ""): Unit = {
    // the quantizer's own build parameters ride in the one `_meta`
    // write beside the source tag, so an occupancy-drift retrain
    // ([[ivfRetrain]]) re-runs the SAME k-means without the caller
    // remembering k — a label-built index ([[ivfWriteIndex]] directly)
    // records none and a retrain there demands explicit parameters
    ivfWriteIndex(
      graft.ops.Stage.materializeOnce(kmeansAssign(df, vecCol, idCol, k, iters)),
      vecCol,
      idCol,
      "cluster",
      path,
      sourceTag,
      metaExtras = Seq(
        "kmeans_k" -> lit(k),
        "kmeans_iters" -> lit(iters)))
  }

  /** Rank IVF clusters by query↔centroid cosine and return the `nprobe`
    * nearest cluster keys. A tiny Spark job over the (cluster, pos, v)
    * centroid rows — never touches the corpus. The query norm is constant
    * across clusters, so `dot/|centroid|` preserves the cosine ranking.
    */
  def ivfRankClusters(
      centroids: DataFrame,
      query: Seq[Double],
      nprobe: Int): Seq[Any] = {
    val q = vecLit(query)
    centroids
      .groupBy("cluster")
      .agg(
        sum(col("v") * element_at(q, col("pos").cast("int") + 1)).as("dot"),
        sum(col("v") * col("v")).as("nrm"))
      .select(col("cluster"), (col("dot") / sqrt(col("nrm"))).as("sim"))
      .orderBy(col("sim").desc)
      .limit(nprobe)
      .collect()
      .map(_.get(0))
      .toSeq
  }

  /** IVF probe against a PRECOMPUTED centroid table: rank clusters, then
    * brute-force only the nprobe nearest. Build the centroids once
    * ([[ivfCentroids]] / [[ivfWriteIndex]]) and reuse across queries —
    * recomputing the index per probe is the classic ANN scale-killer.
    */
  def ivfTopK(
      df: DataFrame,
      centroids: DataFrame,
      vecCol: String,
      idCol: String,
      clusterCol: String,
      query: Seq[Double],
      k: Int,
      nprobe: Int): DataFrame = {
    val probed = ivfRankClusters(centroids, query, nprobe)
    bruteForceTopK(
      df.where(col(clusterCol).isin(probed: _*)),
      vecCol,
      idCol,
      query,
      k)
  }

  /** Persist the build-once IVF index: the corpus laid out PARTITIONED BY
    * cluster (so a probe's `cluster IN (...)` filter becomes partition
    * pruning — nprobe directories read, not a corpus scan) plus the
    * centroid table. At 100 TB this layout is the difference between a
    * probe reading ~nprobe/nclusters of the data and reading all of it.
    */
  def ivfWriteIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      clusterCol: String,
      path: String,
      sourceTag: String = "",
      // extra `_meta` columns written in the SAME job as `source` —
      // a second overwrite of `_meta` would both double the write
      // cost and open a crash window where the file holds only the
      // source tag (an ivfRetrain would then refuse a kmeans-built
      // index as parameterless)
      metaExtras: Seq[(String, Column)] = Nil): Unit = {
    df.select(
        col(idCol).as("id"),
        col(vecCol).as("v"),
        col(clusterCol).as("cluster"))
      .write
      .mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$path/corpus")
    ivfCentroids(df, vecCol, clusterCol)
      .write
      .mode("overwrite")
      .parquet(s"$path/centroids")
    df.sparkSession
      .range(1)
      .select(
        (lit(sourceTag).as("source") +:
          metaExtras.map { case (n, c) => c.as(n) }): _*)
      .write
      .mode("overwrite")
      .parquet(s"$path/_meta")
  }

  /** Incremental IVF maintenance: assign a NEW batch of vectors against
    * the index's EXISTING centroid table (the coarse quantizer is
    * frozen — the standard IVF evolution: inverted lists grow, cells
    * don't move, so the probe contract is unchanged and nothing is
    * rebuilt) and append it into the partitioned corpus layout. The
    * centroid table is k×dim driver-side rows (bounded, corpus-size
    * independent); assignment is the same narrow no-shuffle map as the
    * build; the append writes only the batch.
    *
    * Trades, stated: (1) the append is crash-atomic via
    * [[AtomicAppend.publish]] — staged segment + marker, a mid-write
    * failure leaves nothing a probe honors; (2) a drifted corpus
    * eventually wants re-training the quantizer (rebuild), exactly
    * like production IVF systems.
    */
  /** vector column → FROZEN-centroid cluster-id column, from a
    * persisted `centroids` table ((cluster, pos, v) rows — the layout
    * [[ivfWriteIndex]] and [[graft.operators.ProductQuant
    * .ivfPqWriteIndex]] both write). The centroid table is k×dim
    * driver-side rows (bounded, corpus-size independent); assignment
    * is the same narrow no-shuffle map as the build. Numeric-width-
    * agnostic reads: a label-built index round-trips its cluster
    * column at the label's original type (e.g. BIGINT), and the probe
    * paths are deliberately type-agnostic — this must be too.
    * Centroid ids need not be dense (label-built indexes): assignment
    * returns an array slot, mapped back to the real cluster id.
    * Shared by every append path that must reproduce its build's
    * coarse quantizer.
    */
  private[operators] def frozenClusterAssign(
      spark: org.apache.spark.sql.SparkSession,
      centroidsPath: String): Column => Column = {
    val byCluster = spark.read
      .parquet(centroidsPath)
      .collect()
      .groupBy(_.getAs[Number]("cluster").intValue)
      .map { case (c, rows) =>
        c -> rows
          .sortBy(_.getAs[Number]("pos").intValue)
          .map(_.getAs[Number]("v").doubleValue)
      }
    val ids = byCluster.keys.toArray.sorted
    val arrs = ids.map(byCluster)
    val idLits = array(ids.toIndexedSeq.map(i => lit(i)): _*)
    vec =>
      element_at(
        idLits,
        graft.functions.NearestCentroidExpr
          .ofColumn(vec.cast("array<double>"), arrs) + 1)
  }

  def ivfAppendIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      sourceTag: String = ""): Unit = {
    val spark = df.sparkSession
    if (sourceTag.nonEmpty)
      checkSource("IVF", path, ivfBuiltSource(spark, path), sourceTag)
    val assign = frozenClusterAssign(spark, ivfCentroidsPath(spark, path))
    AtomicAppend.publish(spark, s"$path/corpus") { staging =>
      df.select(
          col(idCol).as("id"),
          col(vecCol).as("v"),
          assign(col(vecCol)).as("cluster"))
        .write
        .mode("overwrite")
        .partitionBy("cluster")
        .parquet(staging)
    }
    // auto-fold: stored (id, v, cluster) rows rewrite into the same
    // cluster-partitioned layout (assignments are already frozen); a
    // retrain fold's carried `_centroids` flows forward so the post-
    // retrain quantizer survives regular compaction
    AtomicAppend.maybeCompact(
      spark, s"$path/corpus", carryMeta = Seq("_centroids")) {
      (d, staging) =>
        d.write.mode("overwrite").partitionBy("cluster").parquet(staging)
    }
  }

  /** Probe a persisted [[ivfWriteIndex]] layout. The `cluster` partition
    * filter prunes at planning time (see PlanSpec's PartitionFilters
    * assertion).
    */
  def ivfProbeIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Seq[Double],
      k: Int,
      nprobe: Int,
      sourceTag: String = ""): DataFrame = {
    if (sourceTag.nonEmpty)
      checkSource("IVF", path, ivfBuiltSource(spark, path), sourceTag)
    val centroids = spark.read.parquet(ivfCentroidsPath(spark, path))
    val probed = ivfRankClusters(centroids, query, nprobe)
    bruteForceTopK(
      AtomicAppend
        .read(spark, s"$path/corpus")
        .where(col("cluster").isin(probed: _*)),
      "v",
      "id",
      query,
      k)
  }

  /** Many-queries probe of a persisted [[ivfWriteIndex]] layout — the
    * batch twin of [[ivfProbeIndex]], mirroring [[lshProbeIndexMany]]:
    *  1. rank clusters per query against the centroid table (one small
    *     job over queries × centroids — centroids are nclusters×dim
    *     rows, never the corpus);
    *  2. read the corpus ONCE with `cluster IN (union of probed
    *     clusters)` — a partition-pruning filter, so only the probed
    *     directories are scanned;
    *  3. broadcast-join the (query, cluster) assignment so each corpus
    *     row scores only against the queries that probed its cluster,
    *     then window top-k per query.
    * One corpus scan for the whole batch instead of one per query.
    */
  def ivfProbeIndexMany(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      k: Int,
      nprobe: Int,
      sourceTag: String = ""): DataFrame = {
    if (sourceTag.nonEmpty)
      checkSource("IVF", path, ivfBuiltSource(spark, path), sourceTag)
    import org.apache.spark.sql.expressions.Window
    val centroids = spark.read.parquet(ivfCentroidsPath(spark, path))
    val qb = queries.select(
      col(qIdCol).as("query_id"),
      col(qVecCol).cast("array<double>").as("qv"))
    // per-(query, cluster) cosine rank against centroids; |q| is constant
    // per query so dot/|centroid| preserves each query's ranking
    val ranked = centroids
      .crossJoin(broadcast(qb))
      .groupBy("query_id", "cluster")
      .agg(
        sum(col("v") * element_at(col("qv"), col("pos").cast("int") + 1))
          .as("dot"),
        sum(col("v") * col("v")).as("nrm"),
        first(col("qv")).as("qv2"))
      .select(
        col("query_id"),
        col("cluster"),
        (col("dot") / sqrt(col("nrm"))).as("csim"),
        col("qv2"))
    // deterministic cluster tiebreak: equal-csim clusters at the nprobe
    // boundary must resolve the same way in every evaluation
    val wq = Window
      .partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cluster").asc)
    // materialize the tiny assignment ONCE (nqueries × nprobe rows):
    // deriving the IN-list and the join side from the same lazy plan
    // would re-run the centroid-ranking job twice
    val assignmentRows = ranked
      .withColumn("crank", row_number().over(wq))
      .where(col("crank") <= nprobe)
      .select(col("query_id"), col("cluster"), col("qv2"))
    val collected = assignmentRows.collect()
    val clusters = collected.map(_.get(1)).distinct.toSeq
    val assignment = spark.createDataFrame(
      java.util.Arrays.asList(collected: _*),
      assignmentRows.schema)
    VectorExpressions.register(spark)
    val scored = AtomicAppend
      .read(spark, s"$path/corpus")
      .where(col("cluster").isin(clusters: _*)) // partition pruning
      .join(broadcast(assignment), Seq("cluster"))
      .select(
        col("query_id"),
        col("id"),
        VectorExpressions.cosineFast(col("v"), col("qv2")).as("sim"))
    // no dedup needed: IVF assigns each corpus vector to exactly ONE
    // cluster directory (unlike LSH bands), so (query, id) is unique
    IndexProbe.perQueryTopK(scored, k, col("sim").desc, col("id").asc)
  }

  /** Many-queries exact top-k: broadcast the (small) query set, score
    * every (query, vector) pair, keep top-k per query via a partitioned
    * window — one broadcast join + one shuffle on query_id.
    */
  def crossTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qVecCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    // rename the query side BEFORE joining (the lshProbeIndexMany
    // pattern): idCol == qIdCol (both "id", the natural call) would
    // otherwise be AMBIGUOUS_REFERENCE after the join
    val q = queries.select(
      col(qIdCol).as("__query_id"), col(qVecCol).as("__qv"))
    val scored = corpus
      .join(broadcast(q))
      .select(
        col("__query_id").as("query_id"),
        col(idCol).as("id"),
        cos(corpus)(col(vecCol), col("__qv")).as("sim"))
    IndexProbe.perQueryTopK(scored, k, col("sim").desc, col("id").asc)
  }

  /** Cosine of every vector to its GROUP's mean centroid — prototype-
    * distance scoring, the embedding-side quality/outlier signal of
    * curation pipelines (SemDeDup's sibling use: prune points far from
    * their cluster prototype; also "is this doc typical of its
    * source"). Low cosine = outlier within its own group.
    *
    * Shape: [[ivfCentroids]]' posexplode + (group, pos) partial+final
    * aggregation — the exchange carries groups·dim partial sums, never
    * vectors — then the #groups-row centroid table (assembled per group
    * by an `array_sort(collect_list(struct(pos, v)))` fold) broadcasts
    * back onto the corpus for a narrow native-cosine projection. One
    * data-sized exchange total; scores need no second pass.
    *
    * A zero vector (or zero centroid) has no direction: cosine is null
    * for it (the native expression's contract), not 0 — matching
    * DuckDB/NumPy NaN-vs-null conventions is the caller's concern.
    */
  def centroidCosine(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      groupCol: String): DataFrame = {
    val cent = ivfCentroids(df, vecCol, groupCol)
      .groupBy("cluster")
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("v")))),
          s => s("v")).as("__cent"))
      .withColumnRenamed("cluster", groupCol)
    // LEFT join: row-preserving — a null group key (or a group that
    // somehow produced no centroid) scores null, it does not vanish
    df.join(broadcast(cent), Seq(groupCol), "left")
      .select(
        col(idCol),
        col(groupCol),
        cos(df)(col(vecCol), col("__cent")).as("cos_c"))
  }
}
