package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Recall, Search}

/** Parameter sweep for the LSH recall work (round-5 item: lsh_mt >= 0.8 @3).
  * Test-scope tool, not shipped: prints recall and candidate-set cost for a
  * grid of (nPlanes, nTables) so the registered defaults are chosen from
  * measurement, not theory. Run: sbt "Test/runMain graft.RecallSweep [sfDir]"
  */
object RecallSweep {
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
    // current defaults first, then the candidate grid
    for ((planes, tables) <- Seq((4, 8), (4, 12), (4, 16), (4, 24), (5, 16), (5, 24), (3, 8))) {
      val t0 = System.nanoTime()
      val r = Recall.recallAtK(exact,
        Dedup.annLshMultiTable(emb, nProbes = 10, k = 3, nPlanes = planes, nTables = tables))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"mt planes=$planes tables=$tables%2d recall=$r%.3f time=$secs%.1fs")
    }
    for (planes <- Seq(4, 5, 6)) {
      val t0 = System.nanoTime()
      val r = Recall.recallAtK(exact,
        Dedup.annLshMultiprobe(emb, nProbes = 10, k = 3, nPlanes = planes))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"mp planes=$planes recall=$r%.3f time=$secs%.1fs")
    }
    spark.stop()
  }
}
