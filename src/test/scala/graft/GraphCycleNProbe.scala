package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{GraphAnn, Recall, Search}

/** Sustained-maintenance quality at a stress tier: recall@3 of the
  * FOUR-cycle maintained k-NN graph vs a from-scratch rebuild of the same
  * final corpus (the ann_graph_cycleN/rebuildN rows Bench records at the
  * bench SF, here runnable against /tmp stress dirs).
  *
  *   sbt "Test/runMain graft.GraphCycleNProbe <sfDir>"
  */
object GraphCycleNProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    emb.count()
    def f(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val t0 = System.nanoTime()
    val (gM, corpusF) = GraphAnn.maintainedGraphCycleN(emb)
    val exact = Search.knnJoin(corpusF, nProbes = 10, k = 3)
    val maintained = Recall.recallAtK(exact,
      GraphAnn.annGraphSearchFrom(gM, corpusF, nProbes = 10, k = 3,
        releaseGraph = true))
    val secM = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val rebuilt = Recall.recallAtK(exact,
      GraphAnn.annGraphSearch(corpusF, nProbes = 10, k = 3))
    val secR = (System.nanoTime() - t1) / 1e9
    println(s"""{"probe":"graph_cycleN","dir":"$dir","cycles":4,""" +
      s""""recall_maintained":${f(maintained)},"recall_rebuilt":${f(rebuilt)},""" +
      s""""sec_maintained_chain":${f(secM)},"sec_rebuild":${f(secR)}}""")
    spark.stop()
  }
}
