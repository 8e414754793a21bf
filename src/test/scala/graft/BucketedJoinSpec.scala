package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.{Tables, Writers}

class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    Writers.writeBucketed(orders, "graft_orders_b", "o_custkey", 8)
    Writers.writeBucketed(
      customer.withColumn("c_custkey", col("c_custkey")), "graft_cust_b", "c_custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join so co-location is what's being tested,
      // and disable AQE so executedPlan is the concrete tree (the adaptive
      // wrapper hides children from collect until finalization)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_cust_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      assert(joined.count() > 0)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected zero shuffles for bucketed join+agg, found ${shuffles.length}")

      // sanity: same join on raw (unbucketed) parquet DOES shuffle
      val raw = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      raw.count()
      val rawShuffles = raw.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(rawShuffles.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_cust_b")
    }
  }
}
