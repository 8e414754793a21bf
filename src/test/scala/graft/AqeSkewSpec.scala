package graft

import org.apache.spark.sql.functions._

/** AQE skew-join evidence — the runtime complement of the MANUAL salting
  * operator (Skew.saltedJoin) and the as-of skew probe: a sort-merge join
  * whose left side is dominated by one hot key must be re-planned by
  * AQE's OptimizeSkewedJoin (the hot partition split into sub-partitions)
  * rather than serializing on one task. Asserted from the executed
  * adaptive plan itself (the SMJ is marked skew=true after execution),
  * with results identical to the unsplit join — the property the 100 TB
  * brief calls "salting for skew, AQE for runtime re-plan". */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shrink thresholds so the test-sized hot key counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // force a shuffled SMJ: broadcast would hide the skew entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 80% of the left side on ONE key, with a fat payload per row
      val left = spark.range(0, 200000).select(
        when(col("id") % 5 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        concat(lit("p"), sha2(col("id").cast("string"), 256)).as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 7).as("v"))
      val joined = left.join(right, "k")
      // materialize through joined's OWN QueryExecution (count() would spin
      // up a separate one and leave this plan unexecuted/isFinalPlan=false)
      val n = joined.queryExecution.toRdd.count()
      // correctness: hot key 1 matches once, plus the id%5==0 keys < 2000
      val expected = 160000L + spark.range(0, 200000)
        .filter(col("id") % 5 === 0 && col("id") =!= 1 && col("id") < 2000)
        .count()
      assert(n == expected, s"join result wrong under AQE skew handling: $n vs $expected")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true in):\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
