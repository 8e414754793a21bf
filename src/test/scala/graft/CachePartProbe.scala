package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: does the persisted repartition(col) edge copy keep its
  * hash partitioning through the per-round join (a) at plan time before
  * the cache is built, (b) after the cache is materialized — i.e. does the
  * real loop's round 1 / rounds ≥ 2 pay an edge-side Exchange? */
object CachePartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e0 = spark.range(100000)
      .select((col("id") % 5000).as("src"), (col("id") % 7000).as("dst"))
      .localCheckpoint()
    val eSrc = e0.repartition(col("src")).persist()
    val vec = spark.range(5000).select(col("id").as("node"), lit(1.0).as("d"))
    def planOf(label: String): Unit = {
      val j = eSrc.join(vec.hint("SHUFFLE_HASH"), col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("d")).as("raw"))
      println(s"=== $label: IMR outputPartitioning = " +
        eSrc.queryExecution.executedPlan.outputPartitioning)
      j.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("InMemory"))
        .foreach(l => println(l.replaceAll("#\\d+L?", "")))
    }
    planOf("before cache build")
    eSrc.count() // build the cache
    planOf("after cache build")
    spark.stop()
  }
}
