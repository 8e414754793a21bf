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

  test("incremental KMV merge is bit-identical to the single-pass sketch") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    def ests(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.select("event_type", "est_users").as[(String, Double)].collect().toMap
    val single = ests(Corpus.kmvDistinct(ev).select(col("event_type"), col("est_users")))
    // k-min sets form a semilattice: re-minning the union of per-day
    // sketches must reproduce the single-pass estimate EXACTLY, under any
    // partitioning of the input
    for (parts <- Seq(1, 5, 16)) {
      val merged = ests(Corpus.kmvMerge(ev.repartition(parts)))
      assert(merged == single, s"parts=$parts: merged=$merged single=$single")
    }
  }
}
