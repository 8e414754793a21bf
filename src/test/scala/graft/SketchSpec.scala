package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.sources.Tables

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch estimates stay within tolerance of exact values") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val sk = Corpus.sketchStats(ev)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    assert(sk.keySet == exact.keySet)
    exact.foreach { case (k, u) =>
      val est = sk(k)
      assert(math.abs(est - u).toDouble / u < 0.1, s"$k: est=$est exact=$u")
    }
  }
}
