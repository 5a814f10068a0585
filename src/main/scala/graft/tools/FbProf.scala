package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}

import graft.Tables

/** Throwaway decomposition of the forced-unfused ingest's pair stage —
  * times each sub-query shape in isolation to attribute the per-batch
  * fixed cost (round-14 verdict #1 work; see BENCH notes).
  */
object FbProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.SignatureExpressions
    SignatureExpressions.register(spark)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    docs.count()
    def time[T](name: String)(b: => T): T = {
      val t0 = System.nanoTime()
      val r = b
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    (0 until 4).foreach { i =>
      println(s"batch $i")
      val batch = docs.where(F.col("doc_id") % 4 === i)
      val stable = time("stable-ckpt")(graft.ops.Stage.materializeOnce(batch))
      val sig = time("sign-ckpt")(graft.ops.Stage.materializeOnce(
        stable.select(
          F.col("doc_id").as("id"),
          graft.functions.TextFunctions.normalized(F.col("text")).as("__n"))
          .select(
            F.col("id"),
            SignatureExpressions.shingleHashesFast(F.col("__n"), 4).as("bh"))
          .select(
            F.col("id"), F.col("bh"),
            SignatureExpressions.minHashFast(F.col("bh"), 32).as("mh"))))
      // banding + bucket agg + pair explode + dedup, NO verify
      val banded = sig
        .where(F.col("mh").getItem(0).isNotNull)
        .select(F.col("id"), F.explode(F.array((0 until 8).map { b =>
          F.hash(F.lit(b), F.slice(F.col("mh"), b * 4 + 1, 4))
        }: _*)).as("bucket"))
      val pre = banded.repartition(8, F.col("bucket"))
      val bucketed = pre.groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.col("id"))).as("ids"))
        .where(F.size(F.col("ids")).between(2, 256))
      val pairs0 = bucketed
        .select(F.explode(F.flatten(F.transform(F.col("ids"), (x, ix) =>
          F.transform(
            F.slice(F.col("ids"), ix + F.lit(2),
              F.greatest(F.size(F.col("ids")) - ix - 1, F.lit(0))),
            y => F.struct(x.as("id_a"), y.as("id_b")))))).as("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .repartition(8, F.col("id_a"), F.col("id_b"))
        .dropDuplicates("id_a", "id_b")
      time("cand-only-collect")(pairs0.limit(1000001).collect().length)
      // verify with TWO broadcasts (current shape)
      val shA = F.broadcast(sig.select(F.col("id").as("id_a"), F.col("bh").as("sh_a")))
      val shB = F.broadcast(sig.select(F.col("id").as("id_b"), F.col("bh").as("sh_b")))
      val nA = F.size(F.col("sh_a")).cast("double")
      val nB = F.size(F.col("sh_b")).cast("double")
      val inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
      val ver = pairs0.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
        .where(F.least(nA, nB) / F.greatest(nA, nB) >= 0.4)
        .select(F.col("id_a"), F.col("id_b"),
          (inter / (nA + nB - inter)).as("j"))
        .where(F.col("j") >= 0.4)
      if (i == 0) {
        val plan = ver.limit(1000001).queryExecution.executedPlan.toString
        println("  reusedExchange=" + plan.contains("ReusedExchange") +
          " broadcasts=" +
          "BroadcastExchange".r.findAllIn(plan).length)
      }
      time("verify-2bc-collect")(ver.limit(1000001).collect().length)
      time("verify-2bc-again")(ver.limit(1000001).collect().length)
      // clone overhead
      time("clone-only")(org.apache.spark.sql.graftbridge.SessionBridge
        .withConfScopedClone(ver.select(F.col("id_a")),
          Map("spark.sql.limit.initialNumPartitions" -> "4096"))(_ => 0))
      time("clone-collect")(org.apache.spark.sql.graftbridge.SessionBridge
        .withConfScopedClone(ver,
          Map("spark.sql.limit.initialNumPartitions" -> "4096"))(
          _.limit(1000001).collect().length))
      // (b) semi-restricted broadcasts: only candidate ids' shingle
      // arrays enter the broadcasts; cand pipeline rerooted so it
      // computes once across the restriction and the main join
      val candL = graft.ops.Stage.rerootLazy(pairs0)
      val candIds = candL.select(F.col("id_a").as("id"))
        .union(candL.select(F.col("id_b").as("id")))
        .dropDuplicates("id")
      val shR = sig.select(F.col("id"), F.col("bh"))
        .join(F.broadcast(candIds), Seq("id"), "left_semi")
      val shAr = F.broadcast(shR.select(F.col("id").as("id_a"), F.col("bh").as("sh_a")))
      val shBr = F.broadcast(shR.select(F.col("id").as("id_b"), F.col("bh").as("sh_b")))
      val verR = candL.join(shAr, Seq("id_a")).join(shBr, Seq("id_b"))
        .where(F.least(nA, nB) / F.greatest(nA, nB) >= 0.4)
        .select(F.col("id_a"), F.col("id_b"),
          (inter / (nA + nB - inter)).as("j"))
        .where(F.col("j") >= 0.4)
      time("verify-restricted")(verR.limit(1000001).collect().length)
      time("verify-restricted-again")(verR.limit(1000001).collect().length)
      // (d) ONE broadcast, reused by both verify joins: identical
      // projection (same alias names) broadcast twice — self-join
      // disambiguation renumbers exprIds, so the two exchanges
      // canonicalize equal and ReuseExchange dedups the build
      val sh1 = F.broadcast(sig.select(F.col("id"), F.col("bh")))
      val nA1 = F.size(F.col("sh_a")).cast("double")
      val nB1 = F.size(F.col("sh_b")).cast("double")
      val inter1 =
        F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
      val ver1 = pairs0
        .join(sh1.as("A"), F.col("id_a") === F.col("A.id"))
        .join(sh1.as("B"), F.col("id_b") === F.col("B.id"))
        .select(F.col("id_a"), F.col("id_b"),
          F.col("A.bh").as("sh_a"), F.col("B.bh").as("sh_b"))
        .where(F.least(nA1, nB1) / F.greatest(nA1, nB1) >= 0.4)
        .select(F.col("id_a"), F.col("id_b"),
          (inter1 / (nA1 + nB1 - inter1)).as("j"))
        .where(F.col("j") >= 0.4)
      if (i == 0) {
        val plan = ver1.limit(1000001).queryExecution.executedPlan.toString
        println("  1bc reusedExchange=" + plan.contains("ReusedExchange") +
          " broadcasts=" + "BroadcastExchange".r.findAllIn(plan).length)
      }
      time("verify-1bc-collect")(ver1.limit(1000001).collect().length)
      time("verify-1bc-again")(ver1.limit(1000001).collect().length)
    }
    spark.stop()
  }
}
