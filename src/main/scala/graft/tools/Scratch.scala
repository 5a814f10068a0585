package graft.tools

import graft.Session

/** Dev-only smoke main (not part of the driver contract): boots the
  * engine session through the public facade and calls the injected
  * native function from plain SQL.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Session.initialize(8)
    spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val row = spark
      .sql("""SELECT vec_id,
                graft_cosine_sim(embedding,
                  (SELECT embedding FROM emb WHERE vec_id = 0)) AS sim
              FROM emb ORDER BY sim DESC LIMIT 3""")
      .collect()
    println("[scratch] top3: " + row.map(r => (r.getLong(0), r.getDouble(1))).mkString(", "))
    assert(row.head.getLong(0) == 0L && math.abs(row.head.getDouble(1) - 1.0) < 1e-12)
    println("[scratch] extensions SQL path OK")
    spark.stop()
  }
}
