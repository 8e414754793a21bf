package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** r11: candidate bound + wall of the semdedup SCALED DEFAULT at organic
  * density (verdict item 1 Done criterion: nat200k candidates ≤2% of
  * all-pairs). Test/runMain graft.SemdedupScaledProbe <dir> */
object SemdedupScaledProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/nat200k")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, dir).localCheckpoint()
    val n = emb.count()
    val k = math.min(4096, math.max(8, math.ceil(n.toDouble / 64).toInt))
    val blocks = graft.operators.Cluster.kmeans(emb, k).groupBy("cluster")
      .agg(count(lit(1)).as("cnt"))
    val cand = blocks.agg(sum(col("cnt") * (col("cnt") - 1))).collect().head.getLong(0) / 2
    val total = n * (n - 1) / 2
    println(f"[semdedup] dir=$dir n=$n k=$k candidates=$cand%,d (${cand.toDouble / total * 100}%.2f%% of $total%,d all-pairs)")
    val t0 = System.nanoTime()
    val rows = graft.operators.Cluster.semdedupScaled(emb).count()
    println(f"[semdedup] scaled-default wall=${(System.nanoTime() - t0) / 1e9}%.1f s rows=$rows%,d")
    spark.stop()
  }
}
