package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{ProductQuant, Recall, Search}

/** Recall sweep for the PQ re-rank depth (round-6 recall work). Test-scope
  * tool, not shipped: prints recall@3 for plain ADC vs exact re-rank at a
  * grid of depths so the registered default is chosen from measurement.
  * Run: sbt "Test/runMain graft.PqSweep [sfDir]"
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val exact = Search.knnJoin(emb, nProbes = 10, k = 3).localCheckpoint()
    println(s"corpus=$n probes=10 k=3")
    val r0 = Recall.recallAtK(exact, ProductQuant.pqSearch(emb, nProbes = 10, k = 3))
    println(f"pq plain       recall=$r0%.3f")
    for (depth <- Seq(10, 30, 50, 100)) {
      val t0 = System.nanoTime()
      val r = Recall.recallAtK(exact,
        ProductQuant.pqRerank(emb, nProbes = 10, k = 3, depth = depth))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"pq rerank d=$depth%3d recall=$r%.3f time=$secs%.1fs")
    }
    val ri0 = Recall.recallAtK(exact, ProductQuant.ivfPqSearch(emb, nProbes = 10, k = 3))
    println(f"ivf_pq plain   recall=$ri0%.3f")
    for (depth <- Seq(10, 30)) {
      val r = Recall.recallAtK(exact,
        ProductQuant.ivfPqRerank(emb, nProbes = 10, k = 3, depth = depth))
      println(f"ivf_pq rr d=$depth%3d recall=$r%.3f")
    }
    spark.stop()
  }
}
