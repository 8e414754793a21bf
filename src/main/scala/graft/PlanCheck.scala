package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for headline queries so the
  * pushdown/broadcast/codegen properties can be eyeballed per round.
  * Usage: runMain graft.PlanCheck [queryName ...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join", "q5_multijoin", "vector_topk", "knn_join",
        "pack_builder", "code_edges", "schema_parse", "chunk_markdown",
        "dedup_minhash_lsh", "bm25_search", "line_dedup", "decontaminate",
        "doc_cluster", "ann_pq", "graph_triangles", "seq_pack")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
