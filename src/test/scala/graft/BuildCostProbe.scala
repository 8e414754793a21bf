package graft

import org.apache.spark.sql.SparkSession

/** One-off decomposition of the NN-descent build cost: seed pass alone,
  * then cumulative rounds 1..4 — shows which stage dominates and whether
  * the fix-point stop ever fires at a given SF.
  *
  *   sbt "Test/runMain graft.BuildCostProbe <sfDir>"
  */
object BuildCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    emb.count()
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[buildcost] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    for (r <- 0 to 4)
      t(s"rounds=$r")(graft.operators.GraphAnn.knnGraph(emb, rounds = r).count())
    spark.stop()
  }
}
