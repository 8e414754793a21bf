package graft
import org.apache.spark.sql.SparkSession
object SparseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    val nc = time("candidates") { graft.operators.TermStats.sparseCosineCandidates(docs).count() }
    println(f"[probe] n_docs=$n n_candidates=$nc selectivity=${nc.toDouble / allPairs * 100}%.3f%% of $allPairs%,d all-pairs")
    val nf = time("full sparse_cosine") { graft.operators.TermStats.sparseCosine(docs).count() }
    println(s"[probe] n_out=$nf")
    val nt = time("sparse_topk") { graft.operators.TermStats.sparseTopK(docs).count() }
    println(s"[probe] topk_out=$nt")
    spark.stop()
  }
}
