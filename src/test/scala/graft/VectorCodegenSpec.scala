package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions

/** The cosine expression's generated-Java path must be bit-identical to
  * its interpreted eval — forced via the codegen factory mode, so this
  * actually exercises doGenCode rather than whatever the planner picks.
  */
class VectorCodegenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scores(): Map[Long, Double] = {
    VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb
      .where(col("vec_id") === 1L)
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]]
      .collect()(0)
    emb
      .select(
        col("vec_id"),
        VectorExpressions
          .cosineFast(col("embedding"), array(q.map(lit): _*))
          .as("cos"))
      .as[(Long, Double)]
      .collect()
      .toMap
  }

  test("doGenCode output is bit-identical to interpreted eval") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "CODEGEN_ONLY")
      val gen = scores()
      spark.conf.set(key, "NO_CODEGEN")
      val interp = scores()
      assert(gen.keySet === interp.keySet)
      gen.foreach { case (id, v) =>
        assert(
          java.lang.Double.doubleToLongBits(v) ===
            java.lang.Double.doubleToLongBits(interp(id)),
          s"vec_id=$id codegen=$v interpreted=${interp(id)}")
      }
      assert(gen.size === 500 && gen(1L) > 0.999999)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("mismatched lengths and null elements yield NULL in both paths") {
    // the composable zip_with form nulls the sum on both inputs; a
    // silent truncation to the shorter side would return a plausible
    // WRONG similarity for a mis-dimensioned query
    VectorExpressions.register(spark)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    def run(): Seq[Option[Double]] = {
      val df = Seq(
        (1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch
        (2L, Seq(1.0, 2.0), Seq(1.0, 2.0)) // clean control
      ).toDF("id", "a", "b")
        .union(spark.sql( // null element
          "SELECT 3L, array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)"))
      df.select(
          col("id"),
          VectorExpressions.cosineFast(col("a"), col("b")).as("cos"))
        .orderBy("id")
        .as[(Long, Option[Double])]
        .collect()
        .map(_._2)
        .toSeq
    }
    try {
      spark.conf.set(key, "CODEGEN_ONLY")
      val gen = run()
      spark.conf.set(key, "NO_CODEGEN")
      val interp = run()
      for (out <- Seq(gen, interp)) {
        assert(out(0).isEmpty, "length mismatch must be NULL")
        assert(out(1).exists(v => math.abs(v - 1.0) < 1e-12))
        assert(out(2).isEmpty, "null element must be NULL")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
