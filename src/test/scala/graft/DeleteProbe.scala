package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r11: measures the DELETE direction of index maintenance (the
  * UpsertProbe mirror) — cost of serving from the maintained index after
  * a departure batch (keyed drops + subtractions against PERSISTED
  * tables) vs re-deriving the index from the post-delete corpus, for the
  * LSH and BM25 families and the components scoped recompute.
  * Usage: Test/runMain graft.DeleteProbe <dataDir> [idxDir] */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idxDir = if (args.length > 1) args(1) else "/tmp/delete_idx"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{GraphOps, MinhashPortable, Search}
    val docs = graft.sources.Tables.documents(spark, dir)
    val isDel = pmod(col("doc_id"), lit(10L)) === 0L
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // ---- LSH ----
    time("lsh index build (one-time, full corpus)") {
      val sig = MinhashPortable.minhashPortable(docs)
      sig.write.mode("overwrite").parquet(s"$idxDir/sig")
      MinhashPortable.bandKeys(spark.read.parquet(s"$idxDir/sig"), 4)
        .write.mode("overwrite").parquet(s"$idxDir/keys")
    }
    val nInc = time("lsh maintained (keyed drop of delete ids)") {
      MinhashPortable.minhashLshDeleteFrom(
        spark.read.parquet(s"$idxDir/sig"), spark.read.parquet(s"$idxDir/keys"),
        docs.filter(isDel).select(col("doc_id"))).count()
    }
    val nFull = time("lsh full re-sketch of survivors") {
      MinhashPortable.minhashLshPortable(docs.filter(!isDel)).count()
    }
    println(s"[probe] lsh n_inc=$nInc n_full=$nFull agree=${nInc == nFull}")

    // ---- BM25 ----
    val terms = Seq("data", "stream")
    time("bm25 index build (one-time, full corpus)") {
      val (post, dl) = Search.bm25IndexParts(docs)
      post.write.mode("overwrite").parquet(s"$idxDir/post")
      dl.write.mode("overwrite").parquet(s"$idxDir/dl")
      spark.read.parquet(s"$idxDir/post").groupBy(col("term"))
        .agg(count(lit(1)).as("df")).write.mode("overwrite").parquet(s"$idxDir/df")
      spark.read.parquet(s"$idxDir/dl")
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        .write.mode("overwrite").parquet(s"$idxDir/sc")
    }
    val bInc = time("bm25 maintained (subtract delete batch)") {
      Search.bm25DeleteFrom(
        spark.read.parquet(s"$idxDir/post"), spark.read.parquet(s"$idxDir/dl"),
        spark.read.parquet(s"$idxDir/df"), spark.read.parquet(s"$idxDir/sc"),
        docs.filter(isDel), terms).count()
    }
    val bFull = time("bm25 full re-index of survivors") {
      val surv = docs.filter(!isDel)
      val (post, dl) = Search.bm25IndexParts(surv)
      val dfF = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scF = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
      Search.bm25DeleteFrom(post, dl, dfF, scF,
        docs.filter(lit(false)), terms).count()
    }
    println(s"[probe] bm25 n_inc=$bInc n_full=$bFull agree=${bInc == bFull}")

    // ---- components ----
    val li = graft.sources.Tables.lineitem(spark, dir)
    val isDelOrder = pmod(col("l_orderkey"), lit(1000L)) === 0L
    time("components standing labeling (one-time, full graph)") {
      GraphOps.connectedComponents(li)
        .write.mode("overwrite").parquet(s"$idxDir/labels")
    }
    val cInc = time("components scoped recompute (touched only)") {
      GraphOps.componentsDeleteFrom(spark.read.parquet(s"$idxDir/labels"),
        GraphOps.copurchase(li.filter(!isDelOrder)),
        GraphOps.copurchase(li.filter(isDelOrder))).count()
    }
    val cFull = time("components full recompute of survivor graph") {
      GraphOps.connectedComponents(li.filter(!isDelOrder)).count()
    }
    println(s"[probe] components n_inc=$cInc n_full=$cFull agree=${cInc == cFull}")
    spark.stop()
  }
}
