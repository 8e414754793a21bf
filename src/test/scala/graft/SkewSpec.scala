package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // 90% of rows share one hot key
    val rows = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong))
    rows.toDF("k", "v").repartition(8)
  }

  test("saltedJoin returns exactly the unsalted join's rows under skew") {
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("dk", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk")
      .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedCountDistinct is exact under skew") {
    val salted = Skew.saltedCountDistinct(skewed, "k", "v")
      .as[(Long, Long)].collect().toMap
    val plain = skewed.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(salted == plain)
  }
}
