package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, Tables}
import graft.operators.SkewJoin

/** Dev-only smoke main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Session.initialize(8)
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d).select("event_id", "user_id", "value")
    val users = Tables.events(spark, d).groupBy("user_id").agg(count(lit(1)).as("n"))
    val plain = ev.join(users, Seq("user_id")).count()
    val salted = SkewJoin.salted(ev, users, "user_id", col("event_id"), 8).count()
    println(s"[scratch] plain=$plain salted=$salted")
    assert(plain == salted)
    println("[scratch] salted join OK")
    spark.stop()
  }
}
