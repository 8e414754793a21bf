package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg matches the window row_number formulation exactly") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(i => (i % 13L, rnd.nextInt(100) / 10.0, i.toLong))
    val df = rows.toDF("key", "score", "id").repartition(8)

    val viaAgg = df.groupBy(col("key"))
      .agg(TopKAgg.topK(col("score"), col("id"), 4).as("topk"))
      .select(col("key"), posexplode(col("topk")))
      .select(col("key"), (col("pos") + 1).as("rn"), col("col.id"), col("col.score"))
      .as[(Long, Int, Long, Double)].collect().toSet

    val w = Window.partitionBy("key").orderBy(desc("score"), col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select(col("key"), col("rn"), col("id"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("TopKAgg handles groups smaller than k and survives serialization") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.7, 11L), (2L, 0.1, 20L))
      .toDF("key", "score", "id").repartition(5)
    val out = df.groupBy(col("key"))
      .agg(TopKAgg.topK(col("score"), col("id"), 10).as("topk"))
      .select(col("key"), size(col("topk")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2, 2L -> 1))
  }
}
