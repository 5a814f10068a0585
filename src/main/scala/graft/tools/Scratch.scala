package graft.tools

import graft.{Session, SparkEntry}

/** Dev-only smoke main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Session.initialize(32)
    val d = "/root/testdata/sf0.1"
    // warm-up
    SparkEntry.queries("q17_cosine_scores")(spark, d).write
      .format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    SparkEntry.queries("q18_ann_lsh_topk")(spark, d).write
      .format("noop").mode("overwrite").save()
    println(f"[scratch] q18 ${(System.nanoTime - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
