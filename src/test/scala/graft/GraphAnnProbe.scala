package graft

import org.apache.spark.sql.SparkSession

/** Recall/coverage probe for the graph-ANN rung: recall@3 vs exact knn,
  * next to the ivf_mp reference rung, at any corpus dir.
  *
  *   sbt "Test/runMain graft.GraphAnnProbe <embDir> [kNbrs] [beam] [searchRounds] [entries]"
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val kNbrs = args.lift(1).map(_.toInt).getOrElse(16)
    val beam = args.lift(2).map(_.toInt).getOrElse(16)
    val rounds = args.lift(3).map(_.toInt).getOrElse(4)
    val entries = args.lift(4).map(_.toInt).getOrElse(4)
    val buildRounds = args.lift(5).map(_.toInt).getOrElse(4)
    val cap = args.lift(6).map(_.toInt).getOrElse(64)
    val kBuild = args.lift(7).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val exact = graft.operators.Search.knnJoin(emb, nProbes = 10, k = 3)
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (rGraph, tGraph) = t(graft.operators.Recall.recallAtK(exact,
      graft.operators.GraphAnn.annGraphSearch(emb, nProbes = 10, k = 3,
        kNbrs = kNbrs, beam = beam, searchRounds = rounds, entries = entries,
        buildRounds = buildRounds, cap = cap, kBuild = kBuild)))
    // graph EDGE recall: fraction of every node's exact top-3 that appear
    // as (undirected) graph edges — separates build quality from search reach
    val exactAll = graft.operators.Search.knnJoin(emb,
      probes = Some(emb), nProbes = Int.MaxValue, k = 3)
      .select(org.apache.spark.sql.functions.col("probe_id"),
        org.apache.spark.sql.functions.col("neighbor_id"))
    val g = graft.operators.GraphAnn.knnGraph(emb, kNbrs = kNbrs,
      rounds = buildRounds, cap = cap, kBuild = kBuild)
    val gsym = g.select(org.apache.spark.sql.functions.col("node").as("probe_id"),
        org.apache.spark.sql.functions.col("nbr").as("neighbor_id"))
      .unionAll(g.select(org.apache.spark.sql.functions.col("nbr").as("probe_id"),
        org.apache.spark.sql.functions.col("node").as("neighbor_id")))
      .distinct()
    val hit = exactAll.join(gsym, Seq("probe_id", "neighbor_id"), "left_semi").count()
    val tot = exactAll.count()
    val edgeRecall = hit.toDouble / tot
    val (rIvf, tIvf) = t(graft.operators.Recall.recallAtK(exact,
      graft.operators.Dedup.annIvfMultiprobe(emb, nProbes = 10, k = 3)))
    def f(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"graph_ann","dir":"$dir","kNbrs":$kNbrs,"beam":$beam,""" +
      s""""searchRounds":$rounds,"entries":$entries,"buildRounds":$buildRounds,"cap":$cap,"kBuild":$kBuild,""" +
      s""""recall_graph":${f(rGraph)},"edge_recall":${f(edgeRecall)},"recall_ivf_mp":${f(rIvf)},""" +
      s""""sec_graph":${f(tGraph)},"sec_ivf_mp":${f(tIvf)}}""")
    spark.stop()
  }
}
