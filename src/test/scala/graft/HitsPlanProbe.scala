package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style probe: does a localCheckpointed repartition(col) frame
  * keep its hash partitioning through an equi-join (no Exchange on the
  * checkpointed side), and which join strategy does each spelling pick?
  * Run: sbt "Test/runMain graft.HitsPlanProbe" */
object HitsPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e0 = spark.range(100000).select((col("id") % 5000).as("src"), (col("id") % 7000).as("dst"))
    val eBySrc = e0.repartition(col("src")).localCheckpoint()
    println("checkpointed partitioning: " +
      eBySrc.queryExecution.executedPlan.outputPartitioning)
    val vec = spark.range(5000).select(col("id").as("node"), lit(1.0).as("d"))
    for (hint <- Seq("SHUFFLE_HASH", "none")) {
      val v = if (hint == "none") vec else vec.hint(hint)
      val j = eBySrc.join(v, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("d")).as("raw"))
      println(s"=== hint=$hint ===")
      j.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Sort "))
        .foreach(println)
    }
    spark.stop()
  }
}
