package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-shot r11 measurement: hot-bucket occupancy and the pair-recall
  * effect of streamingNearDedup's maxBucket cap at a stress tier.
  *   sbt "Test/runMain graft.CapProbe <dir> [cap]" */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cap = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    val sig = graft.operators.MinhashPortable.minhashPortable(docs).localCheckpoint()
    val keys = graft.operators.MinhashPortable.bandKeys(sig, 4).localCheckpoint()
    val occ = keys.groupBy("band", "bkey").count()
    val st = occ.agg(max("count").as("mx"), avg("count").as("mean"),
      sum(when(col("count") > cap, 1L).otherwise(0L)).as("n_over")).collect().head
    println(f"[cap] dir=$dir buckets_max=${st.getLong(0)} mean=${st.getDouble(1)}%.2f over_cap(${cap})=${st.getLong(2)}")
    // capped contract: pair (a,b) iff rank(a) <= cap in a shared bucket
    val rk = keys.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey").orderBy("doc_id")))
    val full = keys.as("a").join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().count()
    val capped = rk.as("a").join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id") && col("a.rn") <= cap)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().count()
    println(f"[cap] pairs_full=$full pairs_capped=$capped kept=${capped.toDouble / math.max(full, 1) * 100}%.2f%%")
    spark.stop()
  }
}
