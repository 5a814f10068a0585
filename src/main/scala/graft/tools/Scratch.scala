package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{VectorExpressions, VectorFunctions}

/** Dev-only instrumentation main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorExpressions.register(spark)

    val emb = Tables.embeddings(spark, d).select(
      col("vec_id"), col("embedding")).persist()
    println("n=" + emb.count())
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label%-24s ${(System.nanoTime - t0) / 1e9}%.2f s")
    }

    // warm-up
    emb.join(broadcast(q.limit(10))).select(
      VectorFunctions.cosine(col("embedding"), col("qv"))).write
      .format("noop").mode("overwrite").save()

    time("cosine zip_with 4M") {
      emb.join(broadcast(q))
        .select(VectorFunctions.cosine(col("embedding"), col("qv")).as("s"))
        .agg(sum("s")).head()
    }
    time("cosine native  4M") {
      emb.join(broadcast(q))
        .select(VectorExpressions.cosineFast(col("embedding"), col("qv")).as("s"))
        .agg(sum("s")).head()
    }
    val diff = emb.join(broadcast(q))
      .select(
        abs(VectorFunctions.cosine(col("embedding"), col("qv")) -
          VectorExpressions.cosineFast(col("embedding"), col("qv"))).as("dd"))
      .agg(max("dd")).head().getDouble(0)
    println(s"[scratch] max |zipwith - native| = $diff")
    spark.stop()
  }
}
