package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the O(Δ) claim of minhash_lsh_upsert: incremental index
  * maintenance against a PERSISTED standing index (the production form,
  * MinhashPortable.minhashLshUpsertFrom over loaded parquet) vs the full
  * corpus recompute a non-incremental pipeline pays per arrival batch.
  * Usage: Test/runMain graft.UpsertProbe <dataDir> [idxDir]
  * Prints one-time index-build time, then incremental vs full wall time
  * and asserts the pair counts agree. */
object UpsertProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idxDir = if (args.length > 1) args(1) else "/tmp/upsert_idx"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.MinhashPortable
    val docs = graft.sources.Tables.documents(spark, dir)
    val isDelta = pmod(col("doc_id"), lit(10L)) === 0L
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    // one-time standing-index build (amortized across all arrival batches)
    time("index build (one-time)") {
      val sigBase = MinhashPortable.minhashPortable(docs.filter(!isDelta))
      sigBase.write.mode("overwrite").parquet(s"$idxDir/sig")
      MinhashPortable.bandKeys(spark.read.parquet(s"$idxDir/sig"), 4)
        .write.mode("overwrite").parquet(s"$idxDir/keys")
    }
    // phase decomposition: the component incremental maintenance saves is
    // the O(text) sketch (full corpus vs arrival batch alone)
    val nSigFull = time("sketch full corpus") {
      MinhashPortable.minhashPortable(docs).count()
    }
    val nSigDelta = time("sketch delta only") {
      MinhashPortable.minhashPortable(docs.filter(isDelta)).count()
    }
    println(s"[probe] sig_rows full=$nSigFull delta=$nSigDelta")
    // per-batch incremental cost: sketch only the batch, join standing tables
    val nInc = time("incremental (delta batch vs persisted index)") {
      MinhashPortable.minhashLshUpsertFrom(
        spark.read.parquet(s"$idxDir/sig"), spark.read.parquet(s"$idxDir/keys"),
        docs.filter(isDelta)).count()
    }
    // per-batch cost without incremental maintenance: full corpus recompute
    val nFull = time("full recompute (restricted to delta-touching pairs)") {
      MinhashPortable.minhashLshPortable(docs)
        .filter(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0).count()
    }
    println(s"[probe] n_inc=$nInc n_full=$nFull agree=${nInc == nFull}")
    // what a non-incremental dedup pass actually scores: ALL pairs, not
    // just the delta-touching restriction Catalyst pushed down above
    if (args.contains("--all-pairs")) {
      val nAll = time("full recompute (unrestricted, all pairs)") {
        MinhashPortable.minhashLshPortable(docs).count()
      }
      println(s"[probe] n_all=$nAll")
    }
    spark.stop()
  }
}

/** Same claim for bm25_upsert: per-arrival-batch cost of maintaining the
  * persisted fulltext index (postings/doclens/df/scalars — all additive)
  * + scoring from it, vs rebuilding the index from the full corpus.
  * Usage: Test/runMain graft.Bm25UpsertProbe <dataDir> [idxDir] */
object Bm25UpsertProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idxDir = if (args.length > 1) args(1) else "/tmp/bm25_idx"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Search
    val terms = SparkEntry.kwTerms
    val docs = graft.sources.Tables.documents(spark, dir)
    val isDelta = pmod(col("doc_id"), lit(10L)) === 0L
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    time("index build (one-time)") {
      val (post, dl) = Search.bm25IndexParts(docs.filter(!isDelta))
      // TERM-CLUSTERED layout — the 100 TB shape: each file covers a term
      // range, so the query-term restriction prunes via min/max stats
      // instead of decoding the whole postings table
      post.repartition(32, col("term")).sortWithinPartitions(col("term"))
        .write.mode("overwrite").parquet(s"$idxDir/post")
      dl.write.mode("overwrite").parquet(s"$idxDir/dl")
      spark.read.parquet(s"$idxDir/post").groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$idxDir/df")
      spark.read.parquet(s"$idxDir/dl")
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        .write.mode("overwrite").parquet(s"$idxDir/sc")
    }
    val inc = time("incremental (delta batch vs persisted index)") {
      Search.bm25UpsertFrom(
        spark.read.parquet(s"$idxDir/post"), spark.read.parquet(s"$idxDir/dl"),
        spark.read.parquet(s"$idxDir/df"), spark.read.parquet(s"$idxDir/sc"),
        docs.filter(isDelta), terms).collect()
    }
    // decomposition: (a) pure maintenance — tokenize the batch and land the
    // additive updates (what every arrival pays); (b) pure scoring from the
    // standing index (what a query pays, amortized over arrivals) — at
    // scale (a) is O(Δ tokens) and (b) is O(query-term postings), while
    // full rebuild pays O(corpus text) per refresh
    time("maintain only (delta tokenize + additive updates landed)") {
      val (postD, dlD) = Search.bm25IndexParts(docs.filter(isDelta))
      postD.write.mode("append").parquet(s"$idxDir/post_delta")
      dlD.write.mode("append").parquet(s"$idxDir/dl_delta")
    }
    time("score only (persisted index, empty batch)") {
      Search.bm25UpsertFrom(
        spark.read.parquet(s"$idxDir/post"), spark.read.parquet(s"$idxDir/dl"),
        spark.read.parquet(s"$idxDir/df"), spark.read.parquet(s"$idxDir/sc"),
        docs.filter(isDelta).filter(lit(false)), terms).collect()
    }
    val full = time("full rebuild (tokenize whole corpus) + score") {
      val (post, dl) = Search.bm25IndexParts(docs)
      val dfF = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scF = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
      Search.bm25UpsertFrom(post, dl, dfF, scF,
        docs.filter(lit(false)), terms).collect()
    }
    println(s"[probe] top=${inc.length} agree=${inc.toSeq == full.toSeq}")
    spark.stop()
  }
}

/** Same claim for graph_components_inc: per-arrival-batch cost of
  * maintaining a PERSISTED component labeling (delta label lookup +
  * label-graph CC + broadcast relabel) vs re-running label propagation
  * over the whole graph. Usage:
  * Test/runMain graft.ComponentsUpsertProbe <dataDir> [idxDir] */
object ComponentsUpsertProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idxDir = if (args.length > 1) args(1) else "/tmp/comp_idx"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.GraphOps
    val li = graft.sources.Tables.lineitem(spark, dir)
    val isDeltaOrder = pmod(col("l_orderkey"), lit(1000L)) === 0L
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    time("standing labeling build (one-time)") {
      GraphOps.connectedComponents(li.filter(!isDeltaOrder))
        .write.mode("overwrite").parquet(s"$idxDir/labels")
    }
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      // order-independent, ANSI-safe (node·4000037+label stays < 2^63)
      val r = df.agg(count(lit(1)), sum(col("label")),
        expr("bit_xor(node * 4000037 + label)")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val inc = time("incremental (delta batch vs persisted labeling)") {
      checksum(GraphOps.componentsUpsertFrom(
        spark.read.parquet(s"$idxDir/labels"),
        GraphOps.copurchase(li.filter(isDeltaOrder))))
    }
    val full = time("full recompute (label propagation over whole graph)") {
      checksum(GraphOps.connectedComponents(li))
    }
    println(s"[probe] inc=$inc full=$full agree=${inc == full}")
    spark.stop()
  }
}
