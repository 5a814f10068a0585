package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide registration path (`spark.sql.extensions=
  * graft.GraftExtensions`) must expose every native expression to plain
  * SQL — built here as a real second session on the shared context
  * (getOrCreate only applies extensions to a NEW session, so the
  * default/active session is cleared first and restored after).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("injected functions resolve from plain SQL") {
    val base = TestSpark.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession
        .builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s
        .sql("""SELECT
             graft_cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c,
             graft_lang_id_ngram('the cat sat on the mat and then it slept')
               AS lang,
             size(graft_shingle_hashes('a b c d e f', 3)) AS n_shingles,
             size(graft_minhash_sig(graft_shingle_hashes('a b c d e f', 3), 8))
               AS sig_len,
             graft_simhash64(array(1L, 2L, 3L)) IS NOT NULL AS sh""")
        .head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(row.getString(1) == "en")
      assert(row.getInt(2) > 0)
      assert(row.getInt(3) == 8)
      assert(row.getBoolean(4))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
