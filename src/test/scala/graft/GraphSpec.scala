package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank pinned against a sequential power-iteration reference on
  * planted graphs, plus the structural invariants the operator's
  * declarative update relies on (mass conservation on symmetrized
  * graphs, per-component independence, centrality ordering).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential fixed-iteration PageRank, same scheme as the operator:
    * symmetrize, init 1/N, rank' = (1-d)/N + d·Σ rank(src)/deg(src).
    */
  private def refPageRank(
      edges: Seq[(Long, Long)],
      iters: Int,
      d: Double): Map[Long, Double] = {
    val sym = (edges ++ edges.map { case (a, b) => (b, a) }).distinct
    val nodes = sym.map(_._1).distinct
    val n = nodes.size.toDouble
    val out = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = sym
        .groupBy(_._2)
        .map { case (v, es) =>
          v -> es.map { case (s, _) => r(s) / out(s) }.sum
        }
      r = nodes.map(v => v -> ((1 - d) / n + d * in(v))).toMap
    }
    r
  }

  private def ranksOf(
      edges: Seq[(Long, Long)],
      iters: Int = 10,
      damping: Double = 0.85): Map[Long, Double] =
    Graph
      .pageRank(edges.toDF("id_a", "id_b"), iterations = iters,
        damping = damping)
      .as[(Long, Double)]
      .collect()
      .toMap

  // chain + triangle + an isolated pair: components of distinct shapes
  private val planted: Seq[(Long, Long)] =
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L))

  test("ranks match the sequential reference on a planted multi-component graph") {
    val got = ranksOf(planted)
    val want = refPageRank(planted, 10, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v: $r vs ${want(v)}")
    }
  }

  test("total rank is conserved at exactly 1 (no dangling mass after symmetrization)") {
    val got = ranksOf(planted, iters = 7)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("star center outranks every leaf; leaves tie") {
    val star = (2L to 9L).map(l => (1L, l))
    val got = ranksOf(star)
    val leaves = (2L to 9L).map(got)
    assert(leaves.forall(l => got(1L) > l))
    assert(leaves.forall(l => math.abs(l - leaves.head) < 1e-12))
  }

  test("duplicate and reversed input pairs do not change the graph") {
    val noisy = planted ++ planted.map { case (a, b) => (b, a) } ++ planted
    val got = ranksOf(noisy)
    val want = ranksOf(planted)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12) }
  }

  /** Weighted sequential reference: contribution ∝ edge weight over the
    * vertex's total outgoing weight.
    */
  private def refWeighted(
      edges: Seq[(Long, Long, Double)],
      iters: Int,
      d: Double): Map[Long, Double] = {
    val sym = (edges ++ edges.map { case (a, b, w) => (b, a, w) })
      .groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).max) }
      .toSeq
    val nodes = sym.map(_._1).distinct
    val n = nodes.size.toDouble
    val out = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = sym
        .groupBy(_._2)
        .map { case (v, es) =>
          v -> es.map { case (s, _, w) => r(s) * w / out(s) }.sum
        }
      r = nodes.map(v => v -> ((1 - d) / n + d * in(v))).toMap
    }
    r
  }

  test("weighted ranks match the weighted reference and conserve mass") {
    val weighted: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 0.9), (2L, 3L, 0.2), (3L, 4L, 0.6), (1L, 3L, 0.4),
        (10L, 11L, 1.0))
    val got = Graph
      .pageRank(
        weighted.toDF("id_a", "id_b", "jaccard"),
        iterations = 10,
        weightCol = Some("jaccard"))
      .as[(Long, Double)]
      .collect()
      .toMap
    val want = refWeighted(weighted, 10, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v: $r vs ${want(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // weighting matters: vertex 2 (strong 0.9 tie to hub 1) must differ
    // from its unweighted rank
    val unweighted = ranksOf(weighted.map(e => (e._1, e._2)))
    assert(math.abs(got(2L) - unweighted(2L)) > 1e-6)
  }

  test("pageRankAuto: driver path == distributed path == reference, both sides of the cap") {
    val weighted: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 0.9), (2L, 3L, 0.2), (3L, 4L, 0.6), (1L, 3L, 0.4),
        (10L, 11L, 1.0))
    val df = weighted.toDF("id_a", "id_b", "jaccard")
    val want = refWeighted(weighted, 10, 0.85)
    // driverCap large → driver loop; driverCap 0 → distributed always;
    // driverCap 3 (< 5 edges) → over-cap fallback to distributed
    Seq(200000, 0, 3).foreach { cap =>
      val got = Graph
        .pageRankAuto(df, iterations = 10, weightCol = Some("jaccard"),
          driverCap = cap)
        .as[(Long, Double)]
        .collect()
        .toMap
      assert(got.keySet === want.keySet, s"cap=$cap")
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-9, s"cap=$cap vertex $v")
      }
    }
  }

  test("string ids rank identically to their long twins (auto falls back to the distributed path)") {
    val byName = planted.map { case (a, b) => (s"doc-$a", s"doc-$b") }
    val got = Graph
      .pageRankAuto(byName.toDF("id_a", "id_b"), iterations = 10)
      .as[(String, Double)]
      .collect()
      .toMap
    val want = refPageRank(planted, 10, 0.85)
    assert(got.keySet === want.keySet.map(v => s"doc-$v"))
    want.foreach { case (v, r) =>
      assert(math.abs(got(s"doc-$v") - r) < 1e-9, s"vertex doc-$v")
    }
  }

  /** Sequential personalized reference: restart vector concentrated on
    * the seed set, otherwise the weighted scheme.
    */
  private def refPersonalized(
      edges: Seq[(Long, Long)],
      seeds: Set[Long],
      iters: Int,
      d: Double): Map[Long, Double] = {
    val sym = (edges ++ edges.map { case (a, b) => (b, a) }).distinct
    val nodes = sym.map(_._1).distinct
    val out = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toDouble }
    def restart(v: Long) = if (seeds(v)) 1.0 / seeds.size else 0.0
    var r = nodes.map(v => v -> restart(v)).toMap
    (1 to iters).foreach { _ =>
      val in = sym
        .groupBy(_._2)
        .map { case (v, es) =>
          v -> es.map { case (s, _) => r(s) / out(s) }.sum
        }
      r = nodes.map(v => v -> ((1 - d) * restart(v) + d * in(v))).toMap
    }
    r
  }

  test("personalized ranks match the reference; mass 1; seed side outranks the far side") {
    val seeds = Set(1L)
    val got = Graph
      .personalizedPageRank(planted.toDF("id_a", "id_b"), Seq(1L),
        iterations = 10)
      .as[(Long, Double)]
      .collect()
      .toMap
    val want = refPersonalized(planted, seeds, 10, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the seed dominates (restart mass) — but relevance is NOT simply
    // monotone along the chain: the reflecting end bounces mass back so
    // vertex 3 edges out vertex 2 (the reference agrees); assert the
    // ordering facts that ARE structural
    assert(Seq(2L, 3L, 4L).forall(v => got(1L) > got(v)))
    assert(Seq(2L, 3L, 4L).forall(v => got(v) > 0.0))
    // components unreachable from the seed get zero relevance
    assert(got(10L) === 0.0 && got(20L) === 0.0)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(planted.toDF("id_a", "id_b"), Nil)
    }
  }

  test("personalized seeds: duplicates dedup, absent seeds drop from the denominator, all-absent fails") {
    val df = planted.toDF("id_a", "id_b")
    val base = Graph
      .personalizedPageRank(df, Seq(1L), iterations = 7)
      .as[(Long, Double)].collect().toMap
    // a duplicated seed must not halve the restart mass
    val dup = Graph
      .personalizedPageRank(df, Seq(1L, 1L), iterations = 7)
      .as[(Long, Double)].collect().toMap
    dup.foreach { case (v, r) => assert(math.abs(r - base(v)) < 1e-12) }
    // an absent seed (999 has no edges) must not leak its share:
    // mass still sums to exactly 1, ranks equal the single-seed run
    val absent = Graph
      .personalizedPageRank(df, Seq(1L, 999L), iterations = 7)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(absent.values.sum - 1.0) < 1e-9)
    absent.foreach { case (v, r) => assert(math.abs(r - base(v)) < 1e-12) }
    // a seed set with NO graph member is unanswerable, loudly
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(df, Seq(999L))
    }
  }

  test("personalized seed-frame path (past literalSeedCap) equals the literal path") {
    val df = planted.toDF("id_a", "id_b")
    // force the broadcast-join restart path with cap 0 — ranks must
    // match the literal-isin path bit-for-near (same plan arithmetic,
    // different restart attachment)
    val literal = Graph
      .personalizedPageRank(df, Seq(1L, 3L), iterations = 8)
      .as[(Long, Double)].collect().toMap
    val joined = Graph
      .personalizedPageRank(df, Seq(1L, 3L), iterations = 8,
        literalSeedCap = 0)
      .as[(Long, Double)].collect().toMap
    assert(joined.keySet === literal.keySet)
    joined.foreach { case (v, r) =>
      assert(math.abs(r - literal(v)) < 1e-12, s"vertex $v")
    }
    assert(math.abs(joined.values.sum - 1.0) < 1e-9)
    // a genuinely large seed list (mostly absent ids) exercises the
    // default cap's join side without a plan-sized isin: mass 1,
    // absent seeds drop from the denominator
    val bigSeeds: Seq[Any] = (1L to 1500L).toSeq
    val big = Graph
      .personalizedPageRank(df, bigSeeds, iterations = 6)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(big.values.sum - 1.0) < 1e-9)
    // present seeds: 1,2,3,4,10,11,12,20,21 → each restart 1/9
    val present = Graph
      .personalizedPageRank(df,
        Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L), iterations = 6)
      .as[(Long, Double)].collect().toMap
    big.foreach { case (v, r) =>
      assert(math.abs(r - present(v)) < 1e-12, s"vertex $v")
    }
  }

  test("canonicalByRank flags exactly one max-rank survivor per component") {
    val rows = Graph
      .canonicalByRank(planted.toDF("id_a", "id_b"))
      .select("id", "component", "rank", "canonical")
      .as[(Long, Long, Double, Boolean)]
      .collect()
    val byComp = rows.groupBy(_._2)
    assert(byComp.keySet === Set(1L, 10L, 20L)) // min-id component labels
    byComp.foreach { case (comp, members) =>
      val canon = members.filter(_._4)
      assert(canon.length === 1, s"component $comp")
      val best = members.maxBy(m => (m._3, -m._1))
      assert(canon.head._1 === best._1, s"component $comp survivor")
    }
    // chain 1-2-3-4: middle vertices outrank endpoints, survivor is the
    // min-id middle vertex (2), NOT min-id overall (1) — the policy
    // difference vs resolveComponents' survivor
    assert(byComp(1L).filter(_._4).head._1 === 2L)
  }

  test("triangleStats: planted triangle, coefficients, noise invariance") {
    // triangle 1-2-3, pendant 3-4, isolated pair 10-11; plus noise:
    // duplicate edges, reversed orientation, a self-loop
    val edges: Seq[(Long, Long)] =
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (10L, 11L),
        (2L, 1L), (1L, 2L), (5L, 5L))
    val got = Graph
      .triangleStats(edges.toDF("id_a", "id_b"))
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L)) // self-loop vertex absent
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L)._1 === 3L && got(3L)._2 === 1L)
    assert(math.abs(got(3L)._3 - 1.0 / 3.0) < 1e-9)
    assert(got(4L) === ((1L, 0L, 0.0)))
    assert(got(10L) === ((1L, 0L, 0.0)))
    assert(got(11L) === ((1L, 0L, 0.0)))
  }

  test("dedupByCanonical keeps survivors + rows outside the pair graph") {
    val canon = Graph.canonicalByRank(planted.toDF("id_a", "id_b"))
    // corpus: all graph vertices plus untouched stranger 99
    val corpus = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 99L))
      .map(id => (id, s"doc $id"))
      .toDF("doc_id", "text")
    val kept = Graph
      .dedupByCanonical(corpus, "doc_id", canon)
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    val survivors = canon
      .where(col("canonical"))
      .select("id")
      .as[Long]
      .collect()
      .toSet
    assert(kept === survivors + 99L)
  }

  test("personalizedPageRankAuto: driver path == distributed path, both cap sides") {
    val df = planted.toDF("id_a", "id_b")
    val want = Graph
      .personalizedPageRank(df, Seq(1L, 10L), iterations = 8)
      .as[(Long, Double)].collect().toMap
    Seq(0, 100000).foreach { cap =>
      val got = Graph
        .personalizedPageRankAuto(df, Seq(1L, 10L), iterations = 8,
          driverCap = cap)
        .as[(Long, Double)].collect().toMap
      assert(got.keySet === want.keySet, s"cap=$cap")
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-9, s"cap=$cap vertex $v")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"cap=$cap")
    }
    // seed semantics carry over: duplicates dedup, absent seeds drop,
    // all-absent fails loudly on the driver path too
    val dup = Graph
      .personalizedPageRankAuto(df, Seq(1L, 1L, 10L, 999L), iterations = 8)
      .as[(Long, Double)].collect().toMap
    dup.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12) }
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRankAuto(df, Seq(999L))
    }
  }

  test(
    "invalid edges (null ids, null/zero/negative weights) drop " +
      "identically on both sides of the driver cap") {
    val clean: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 0.9), (2L, 3L, 0.4), (3L, 1L, 0.7), (10L, 11L, 1.0))
    val noisy = clean.map { case (a, b, w) =>
      (Option(a), Option(b), Option(w))
    } ++ Seq(
      (None, Option(5L), Option(0.5)), // null src
      (Option(5L), None, Option(0.5)), // null dst
      (Option(6L), Option(7L), None), // null weight
      (Option(6L), Option(7L), Option(0.0)), // zero weight
      (Option(8L), Option(9L), Option(-0.3))) // negative weight
    val noisyDf = noisy.toDF("id_a", "id_b", "jaccard")
    val want = Graph
      .pageRank(clean.toDF("id_a", "id_b", "jaccard"), iterations = 6,
        weightCol = Some("jaccard"))
      .as[(Long, Double)]
      .collect()
      .toMap
    // distributed path (cap 0) and driver path (cap high): the invalid
    // rows must vanish before staging on BOTH, never NPE, and the
    // surviving graph must rank exactly as the clean input does
    Seq(0, 100000).foreach { cap =>
      val got = Graph
        .pageRankAuto(noisyDf, iterations = 6, weightCol = Some("jaccard"),
          driverCap = cap)
        .as[(Long, Double)]
        .collect()
        .toMap
      assert(got.keySet === want.keySet, s"cap=$cap")
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-9, s"cap=$cap vertex $v")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
    }
  }
}
