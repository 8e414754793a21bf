package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Recall, Search}

/** Throwaway attribution probe: runs each recall-block entry separately with
  * stdout markers so large-task warnings in stderr can be attributed by
  * timestamp/position (not a spec). */
object RecallAttributionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1) == "rules")
      graft.functions.GraftFunctions.registerOptimizerRules(spark)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def exact = Search.knnJoin(emb, nProbes = 10, k = 3)
    val entries: Seq[(String, () => Double)] = Seq(
      "exact_alone" -> (() => { exact.count(); 0.0 }),
      "ann_lsh" -> (() => Recall.recallAtK(exact, Dedup.annLsh(emb, 10, 3))),
      "ann_lsh_mt" -> (() => Recall.recallAtK(exact, Dedup.annLshMultiTable(emb, 10, 3))),
      "ann_lsh_mp" -> (() => Recall.recallAtK(exact, Dedup.annLshMultiprobe(emb, 10, 3))),
      "ann_ivf" -> (() => Recall.recallAtK(exact, Dedup.annIvf(emb, 16, 10, 3))),
      "ann_ivf_mp" -> (() => Recall.recallAtK(exact, Dedup.annIvfMultiprobe(emb, 16, 10, 3))),
      "ann_ivf_tr" -> (() => Recall.recallAtK(exact, graft.operators.Cluster.annIvfTrained(emb, 16, 10, 3))),
      "ann_pq" -> (() => Recall.recallAtK(exact, graft.operators.ProductQuant.pqSearch(emb))),
      "ann_pq_tr" -> (() => Recall.recallAtK(exact, graft.operators.ProductQuant.pqSearchTrained(emb))),
      "ann_pq_rerank" -> (() => Recall.recallAtK(exact, graft.operators.ProductQuant.pqRerank(emb))),
      "ann_sq8" -> (() => Recall.recallAtK(exact, graft.operators.ScalarQuant.sq8Search(emb))),
      "ann_ivf_pq" -> (() => Recall.recallAtK(exact, graft.operators.ProductQuant.ivfPqSearch(emb))),
      "ann_ivf_pq_rr" -> (() => Recall.recallAtK(exact, graft.operators.ProductQuant.ivfPqRerank(emb))))
    entries.foreach { case (name, f) =>
      System.err.println(s"[attr] BEGIN $name")
      val r = f()
      System.err.println(f"[attr] END $name recall=$r%.2f")
    }
    spark.stop()
  }
}
