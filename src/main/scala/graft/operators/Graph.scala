package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over pair graphs (near-dup pairs, co-occurrence
  * edges). The reference has no graph surface at all — this extends the
  * dedup pipeline ([[Dedup.resolveComponents]] gives WHICH docs are
  * transitively duplicated; PageRank gives WHO should survive): min-id
  * survivor selection is arbitrary, while rank-weighted selection keeps
  * the most-connected (most canonical / most-replicated) version of a
  * duplicated document — the curation policy web-corpus pipelines use
  * for boilerplate-heavy near-dup clusters.
  *
  * Spark-first shape: each power-iteration round is ONE hash join
  * (edges ⋈ ranks on `src`) plus ONE aggregation (contributions summed
  * per `dst`) — both shuffle ON THE PAIR GRAPH ONLY, never the corpus,
  * exactly like the component resolver. The edge frame (with
  * out-degrees attached) is materialized once and reused by all rounds,
  * so per-round work is |E| join probes + |E| partial-aggregated
  * contribution rows. At 100 TB the pair graph is orders of magnitude
  * smaller than the input; rounds are fixed (default 10), so total cost
  * is O(iterations · |E|) with flat lineage (periodic checkpoint keeps
  * the plan from growing with the round count).
  */
object Graph {

  /** Shared edge staging of the rank family: symmetrize (both
    * orientations), dedup duplicate (src, dst) rows keeping the max
    * weight, attach each vertex's out-weight normalizer to every edge
    * row, pre-partition by src, materialize. Ids stay their source
    * type (only equi-joins touch them — string doc ids work exactly as
    * the component resolver's; a numeric cast would throw under ANSI
    * for no benefit). Staged BEFORE the degree self-join: edges feed
    * both sides, and an un-staged expensive pair pipeline would
    * execute twice (the resolveComponents edge-staging rationale).
    */
  private def stagedEdgesWithDeg(
      pairs: DataFrame,
      idA: String,
      idB: String,
      weightCol: Option[String]): DataFrame = {
    val a = col(idA)
    val b = col(idB)
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    // Enforce the documented "weights must be > 0" contract in the
    // staging scan rather than trusting the caller: a zero/negative/
    // null weight (or a null endpoint id) would make deg ≤ 0 or null,
    // and every downstream round would silently leak rank mass as
    // NaN — the sum-to-1 invariant would break with no error. One
    // conjunctive filter in the projection costs nothing and makes
    // both the distributed and the driver-capped paths see the same
    // edge set.
    val valid = a.isNotNull && b.isNotNull && w.isNotNull && (w > 0.0)
    val edges = graft.ops.Stage.materializeOnce(
      pairs
        .where(valid)
        .select(a.as("src"), b.as("dst"), w.as("w"))
        .union(pairs.where(valid).select(b.as("src"), a.as("dst"), w.as("w")))
        .groupBy("src", "dst")
        .agg(max(col("w")).as("w")))
    // the per-vertex normalizer (Σ outgoing weight; plain degree when
    // unweighted) rides along on every edge row so each round's
    // contribution is a pure projection after the join — no second
    // per-round join against a degree table
    edges
      .join(edges.groupBy("src").agg(sum(col("w")).as("deg")), Seq("src"))
      .repartition(col("src"))
      .transform(graft.ops.Stage.materializeOnce)
  }

  /** Fixed-iteration PageRank over an UNDIRECTED graph given as a pair
    * list (each row one edge, any orientation; duplicates are dropped
    * after symmetrization). Symmetrizing guarantees every vertex has
    * out-degree ≥ 1, so there is no dangling-mass term — total rank
    * stays exactly 1 per round (GraphSpec pins the invariant), which
    * keeps the update purely declarative: no per-round driver scalar,
    * the vertex count joins on as a broadcast 1-row aggregate.
    *
    * Fixed rounds rather than convergence testing: a convergence check
    * is a per-round global L1-distance job, and curation ranking only
    * needs the ORDER of ranks to settle — 10 damped rounds on a
    * near-dup graph (diameter-bounded components, see
    * [[Dedup.resolveComponents]]'s cap rationale) is already
    * order-stable; callers that need tighter residuals pass more
    * rounds.
    *
    * @param pairs      edge list; one row per pair
    * @param iterations power-iteration rounds (each ~ one shuffle pair)
    * @param damping    teleport factor d: rank = (1-d)/N + d·Σ in-mass
    * @param checkpointEvery rounds between lineage truncations
    * @param weightCol  optional edge-weight column (e.g. the pair's
    *                   Jaccard): a vertex splits its rank over
    *                   neighbors ∝ weight instead of uniformly, so a
    *                   0.95-dup neighbor pulls more canonical mass
    *                   than a borderline 0.2 one. Duplicate (src, dst)
    *                   rows keep the max weight; weights must be > 0
    *                   (the normalizer is Σ weight per vertex). None =
    *                   unweighted (all edges weight 1).
    * @return (id, rank) — one row per vertex of the pair graph, ranks
    *         summing to 1
    */
  def pageRank(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointEvery: Int = 4,
      weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(
      damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    require(
      checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val withDeg = stagedEdgesWithDeg(pairs, idA, idB, weightCol)
    // vertex count as a 1-row frame: broadcast-crossed onto the update
    // instead of collected — keeps the whole pipeline one lazy plan per
    // round (and the audit-visible plans free of driver constants)
    val nFrame = graft.ops.Stage.materializeOnce(
      withDeg.select(countDistinct(col("src")).as("n")))
    var ranks = withDeg
      .select(col("src").as("id"))
      .distinct()
      .crossJoin(broadcast(nFrame))
      .select(col("id"), (lit(1.0) / col("n")).as("rank"))
      .transform(graft.ops.Stage.materializeOnce)
    var round = 0
    while (round < iterations) {
      val next = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(
          col("dst").as("id"),
          (col("rank") * col("w") / col("deg")).as("c"))
        .groupBy("id")
        .agg(sum("c").as("in_mass"))
        .crossJoin(broadcast(nFrame))
        .select(
          col("id"),
          ((lit(1.0) - damping) / col("n") + lit(damping) * col("in_mass"))
            .as("rank"))
      round += 1
      // symmetrized graph ⇒ every vertex has an in-edge ⇒ `next` covers
      // all vertices; no outer join against the vertex set needed
      ranks =
        if (round % checkpointEvery == 0 || round == iterations)
          graft.ops.Stage.materializeOnce(next)
        else next
    }
    ranks
  }

  /** PERSONALIZED PageRank: teleport mass returns only to the `seeds`
    * instead of uniformly — ranks become "relevance to this seed set"
    * (random walk with restart), the probe form of graph relevance:
    * given k example docs, rank the near-dup graph's members by
    * closeness to them. Same per-round shape as [[pageRank]] (one join
    * + one aggregation over the pair graph); the teleport vector is a
    * literal `isin` over the seed list when it is query-like
    * (≤ `literalSeedCap`, default 1000) so it rides in the projection
    * with no extra join, and a broadcast one-column seed frame past
    * the cap (a literal that large would blow up analysis/codegen
    * with a plan-sized predicate). Vertices unreachable
    * from the seeds converge to rank 0, seeds keep at least their
    * (1−d)/|seeds| restart mass; total rank stays exactly 1 on the
    * symmetrized (dangling-free) graph.
    *
    * @param seeds non-empty seed vertex ids (compared to the id
    *              columns' values — same type). Duplicates are
    *              deduplicated and the restart mass splits over the
    *              seeds PRESENT in the pair graph; a seed set with no
    *              graph member at all fails loudly (its relevance
    *              question is unanswerable, not zero).
    */
  def personalizedPageRank(
      pairs: DataFrame,
      seeds: Seq[Any],
      idA: String = "id_a",
      idB: String = "id_b",
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointEvery: Int = 4,
      weightCol: Option[String] = None,
      literalSeedCap: Int = 1000): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(
      damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    require(
      checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val withDeg = stagedEdgesWithDeg(pairs, idA, idB, weightCol)
    val vertices = withDeg.select(col("src").as("id")).distinct()
    // restart mass splits over the seeds PRESENT in the pair graph
    // (deduplicated): a duplicated seed id or one with no edges would
    // otherwise leak its 1/|seeds| share and total rank would converge
    // below 1, silently breaking the mass invariant. A fully absent
    // seed set is a caller error, loudly.
    val distinctSeeds = seeds.distinct
    // Two restart-vector shapes by seed count. A query-like seed list
    // (≤ literalSeedCap) rides the projection as a literal `isin` — no
    // join at all. Past the cap, an isin literal becomes a plan-sized
    // predicate (analysis + Janino blowup scales with the seed count),
    // so the seeds become a broadcast one-column frame instead: the
    // restart value attaches via a broadcast LEFT join (coalesce to 0
    // for non-seeds) — one broadcast hash join per round, no shuffle
    // added, seed-list size bounded only by broadcast capacity.
    val useSeedFrame = distinctSeeds.length > literalSeedCap
    val spark = pairs.sparkSession
    val seedRestart: Option[DataFrame] = if (useSeedFrame) {
      import scala.jdk.CollectionConverters._
      val idType = pairs.schema
        .find(_.name.equalsIgnoreCase(idA))
        .map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(
          s"column $idA not found in pair frame"))
      // Seeds arrive as Seq[Any]; stuffing raw values into rows typed
      // by the PAIR column's DataType would throw an encoder
      // ClassCastException the moment a caller passes Int/Short seeds
      // against a Long id column — a mismatch the literal isin path
      // below the cap silently absorbs via implicit cast. Mirror that
      // coercion: build the frame as strings and CAST to the column
      // type (lossless for the integral/string id shapes this API
      // takes), so both seed paths accept the same inputs.
      val seedDf = spark.createDataFrame(
        distinctSeeds.map(s =>
          org.apache.spark.sql.Row(String.valueOf(s))).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "id_str", org.apache.spark.sql.types.StringType))))
        .select(col("id_str").cast(idType).as("id"))
      val present = vertices.join(broadcast(seedDf), Seq("id")).count()
      require(
        present > 0,
        s"none of the ${distinctSeeds.length} seed ids appear in the pair graph")
      Some(
        graft.ops.Stage.materializeOnce(
          vertices
            .join(broadcast(seedDf), Seq("id"))
            .select(col("id"), lit(1.0 / present).as("restart"))))
    } else None
    val restartLit: org.apache.spark.sql.Column =
      if (useSeedFrame) lit(0.0)
    else {
      val present =
        vertices.where(col("id").isin(distinctSeeds: _*)).count()
      require(
        present > 0,
        s"none of the ${distinctSeeds.length} seed ids appear in the pair graph")
      when(col("id").isin(distinctSeeds: _*), lit(1.0 / present))
        .otherwise(lit(0.0))
    }
    // attach the restart value to a vertex-keyed frame: literal
    // projection below the cap, broadcast left join above it
    def withRestart(df: DataFrame): DataFrame = seedRestart match {
      case Some(sr) =>
        df.join(broadcast(sr), Seq("id"), "left")
          .withColumn("restart", coalesce(col("restart"), lit(0.0)))
      case None => df.withColumn("restart", restartLit)
    }
    var ranks = withRestart(vertices)
      .select(col("id"), col("restart").as("rank"))
      .transform(graft.ops.Stage.materializeOnce)
    var round = 0
    while (round < iterations) {
      val inMass = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(
          col("dst").as("id"),
          (col("rank") * col("w") / col("deg")).as("c"))
        .groupBy("id")
        .agg(sum("c").as("in_mass"))
      val next = withRestart(inMass)
        .select(
          col("id"),
          ((lit(1.0) - damping) * col("restart") +
            lit(damping) * col("in_mass")).as("rank"))
      round += 1
      ranks =
        if (round % checkpointEvery == 0 || round == iterations)
          graft.ops.Stage.materializeOnce(next)
        else next
    }
    ranks
  }

  /** [[personalizedPageRank]] with the [[pageRankAuto]] driver
    * short-circuit: 10 sequential distributed rounds cost ~100 ms of
    * job overhead EACH, which dominates on an oracle-scale pair graph;
    * under the cap the same symmetrize / max-weight dedup / damped
    * restart update iterates on the driver in microseconds, agreeing
    * with the distributed rounds to float reassociation (GraphSpec
    * pins both paths to the reference). Same integral-id guard and
    * same seed semantics (dedup, present-only denominator, loud
    * all-absent failure).
    */
  def personalizedPageRankAuto(
      pairs: DataFrame,
      seeds: Seq[Any],
      idA: String = "id_a",
      idB: String = "id_b",
      iterations: Int = 10,
      damping: Double = 0.85,
      weightCol: Option[String] = None,
      driverCap: Int = 200000): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(
      damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    import org.apache.spark.sql.types._
    val spark = pairs.sparkSession
    val idTypes = Seq(idA, idB).map(c =>
      pairs.schema.find(_.name.equalsIgnoreCase(c)).map(_.dataType))
    val integral = idTypes.forall {
      case Some(LongType | IntegerType | ShortType | ByteType) => true
      case _ => false
    }
    val longSeeds = seeds.distinct.collect {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    if (!integral || driverCap <= 0 || longSeeds.size != seeds.distinct.size)
      return personalizedPageRank(pairs, seeds, idA, idB, iterations,
        damping, weightCol = weightCol)
    val wCol =
      weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val head = pairs
      .where(
        col(idA).isNotNull && col(idB).isNotNull &&
          wCol.isNotNull && (wCol > 0.0))
      .select(col(idA).cast("long"), col(idB).cast("long"), wCol)
      .limit(driverCap + 1)
      .collect()
    if (head.length > driverCap)
      return personalizedPageRank(pairs, seeds, idA, idB, iterations,
        damping, weightCol = weightCol)
    val sym = head.iterator
      .flatMap { r =>
        val (a, b, w) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Iterator((a, b) -> w, (b, a) -> w)
      }
      .toSeq
      .groupBy(_._1)
      .map { case (e, ws) => (e._1, e._2, ws.map(_._2).max) }
      .toSeq
    val nodes = sym.map(_._1).distinct.sorted
    val present = longSeeds.toSet.intersect(nodes.toSet)
    require(
      present.nonEmpty,
      s"none of the ${longSeeds.size} seed ids appear in the pair graph")
    val restart =
      nodes.map(v => v -> (if (present(v)) 1.0 / present.size else 0.0)).toMap
    val out = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
    val inEdges = sym.groupBy(_._2)
    var r = restart
    (1 to iterations).foreach { _ =>
      r = nodes.map { v =>
        val in = inEdges(v).map { case (s, _, w) => r(s) * w / out(s) }.sum
        v -> ((1.0 - damping) * restart(v) + damping * in)
      }.toMap
    }
    import spark.implicits._
    nodes
      .map(v => (v, r(v)))
      .toDF("id", "rank")
      .select(col("id").cast(idTypes.head.get).as("id"), col("rank"))
  }

  /** [[pageRank]] with a driver short-circuit under `driverCap` edges
    * (the [[Dedup.resolveComponentsAuto]] stance): 10 distributed
    * rounds of join+agg each cost ~100 ms of fixed job overhead, which
    * DOMINATES on an oracle-scale pair graph — a graph whose edge list
    * fits comfortably on the driver iterates there in microseconds —
    * same symmetrize / max-weight dedup / damped update, agreeing with
    * the distributed rounds to float-summation reassociation (~1e-12;
    * GraphSpec pins both paths to the reference). Over-cap graphs pay
    * one partial scan (limit cap+1) and take the distributed path —
    * the 100-TB posture is unchanged.
    */
  def pageRankAuto(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      iterations: Int = 10,
      damping: Double = 0.85,
      weightCol: Option[String] = None,
      driverCap: Int = 200000): DataFrame = {
    // validate HERE too: the argument contract must not depend on which
    // side of the size cap a graph lands on
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(
      damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    import org.apache.spark.sql.types._
    val spark = pairs.sparkSession
    // non-integral ids take the distributed path (its joins are
    // type-generic); the driver loop's LongMap state is not — the
    // resolveComponentsAuto guard, same rationale. Name lookup is
    // case-INsensitive, matching how col(idA) resolves downstream
    // (spark.sql.caseSensitive=false default).
    val idTypes = Seq(idA, idB).map(c =>
      pairs.schema.find(_.name.equalsIgnoreCase(c)).map(_.dataType))
    val integral = idTypes.forall {
      case Some(LongType | IntegerType | ShortType | ByteType) => true
      case _ => false
    }
    if (!integral || driverCap <= 0)
      return pageRank(pairs, idA, idB, iterations, damping,
        weightCol = weightCol)
    // Same validity filter as stagedEdgesWithDeg: null ids / null or
    // non-positive weights are dropped BEFORE the cap probe, so a
    // graph sees the identical edge set on both sides of the
    // driverCap boundary (the distributed path's staging filter drops
    // them; an unfiltered collect here would instead NPE on
    // r.getLong(null) — behavior must not depend on which side of
    // the cap a graph lands on).
    val wCol =
      weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val head = pairs
      .where(
        col(idA).isNotNull && col(idB).isNotNull &&
          wCol.isNotNull && (wCol > 0.0))
      .select(col(idA).cast("long"), col(idB).cast("long"), wCol)
      .limit(driverCap + 1)
      .collect()
    if (head.length > driverCap)
      return pageRank(pairs, idA, idB, iterations, damping,
        weightCol = weightCol)
    val sym = head.iterator
      .flatMap { r =>
        val (a, b, w) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Iterator((a, b) -> w, (b, a) -> w)
      }
      .toSeq
      .groupBy(_._1)
      .map { case (e, ws) => (e._1, e._2, ws.map(_._2).max) }
      .toSeq
    val nodes = sym.map(_._1).distinct.sorted
    val n = nodes.size.toDouble
    val out = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
    val inEdges = sym.groupBy(_._2)
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iterations).foreach { _ =>
      r = nodes.map { v =>
        val in = inEdges(v).map { case (s, _, w) => r(s) * w / out(s) }.sum
        v -> ((1.0 - damping) / n + damping * in)
      }.toMap
    }
    import spark.implicits._
    // cast ids back to the SOURCE column type: the result schema must
    // not depend on which side of the size cap a graph lands on (the
    // distributed path preserves the input type; IntegerType inputs
    // would otherwise come back LongType only under the cap)
    nodes
      .map(v => (v, r(v)))
      .toDF("id", "rank")
      .select(col("id").cast(idTypes.head.get).as("id"), col("rank"))
  }

  /** Rank-weighted survivor selection: given near-dup PAIRS, resolve
    * transitive components AND rank vertices, then mark per component
    * the max-rank member (ties broken on min id — deterministic) as
    * canonical. Returns every vertex of the pair graph:
    * (id, component, rank, canonical).
    *
    * This replaces [[Dedup.resolveComponents]]' min-id survivor policy
    * with a centrality policy; the component column is identical, so
    * [[Dedup.dedupByComponents]]-style corpus filtering composes
    * unchanged (anti-join the non-canonical ids).
    */
  def canonicalByRank(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      iterations: Int = 10,
      damping: Double = 0.85,
      weightCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pairs feed BOTH the component resolver and the rank iteration —
    // materialize once or the pair-generation pipeline runs twice
    val staged = graft.ops.Stage.materializeOnce(pairs)
    val comps = Dedup.resolveComponentsAuto(staged, idA, idB)
    val ranks =
      pageRankAuto(staged, idA, idB, iterations, damping,
        weightCol = weightCol)
    val w = Window
      .partitionBy("component")
      .orderBy(col("rank").desc, col("id").asc)
    comps
      .join(ranks, Seq("id"))
      .withColumn("canonical", row_number().over(w) === 1)
  }

  /** Per-vertex triangle counts + local clustering coefficient over an
    * undirected pair graph — the cluster-SHAPE diagnostic of near-dup
    * resolution: a dup component that is a clique (coefficient ≈ 1) is
    * one true duplicate group; a straggly chain (≈ 0) is transitive
    * drift where min-id/rank survivor selection deserves scrutiny.
    *
    * Classic distributed triangle counting: canonicalize each edge to
    * (min, max), then two equi-joins enumerate each triangle exactly
    * once as x < y < z — work is Σ deg(v)² in candidate wedges, ON THE
    * PAIR GRAPH ONLY, and upstream pair generation's bucket caps bound
    * vertex degree, which bounds the wedge explosion (the skew story of
    * the resolver, one step further). Coefficient = 2·tri / deg·(deg−1)
    * (0 for deg < 2 — no wedge to close).
    */
  def triangleStats(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val a = col(idA)
    val b = col(idB)
    val e = graft.ops.Stage.materializeOnce(
      pairs
        .where(a =!= b)
        .select(least(a, b).as("a"), greatest(a, b).as("b"))
        .distinct())
    val tris = e
      .select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), Seq("y"))
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    val triPerVertex = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e
      .select(col("a").as("id"))
      .union(e.select(col("b").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("degree"))
    deg
      .join(triPerVertex, Seq("id"), "left")
      .select(
        col("id"),
        col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(
          col("degree") >= 2,
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0))
          .as("clustering"))
  }

  /** Apply the rank-weighted dedup decision: keep every corpus row
    * whose id is NOT a non-canonical member of a pair-graph component
    * (rows absent from the pair graph are untouched — exactly
    * [[Dedup.dedupByComponents]]' contract with the survivor policy
    * swapped from min-id to max-rank). LEFT ANTI on the drop-list: the
    * corpus side never shuffles more than its join keys, and the
    * drop-list (non-canonical near-dup vertices only) is small, so AQE
    * broadcasts it.
    */
  def dedupByCanonical(
      df: DataFrame,
      idCol: String,
      canonical: DataFrame): DataFrame =
    df.join(
      canonical
        .where(!col("canonical"))
        .select(col("id").as(idCol)),
      Seq(idCol),
      "left_anti")
}
