package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-stress corpus generator — the committed recipe behind
  * STRESS_sf1/sf3 (the round-5 sweeps were generated ad hoc; this makes the
  * replica semantics reproducible). Test-scope tool:
  *
  *   sbt "Test/runMain graft.StressGen <replicas> <outDir> [srcDir]"
  *
  * Replica i is a DISJOINT sub-database: every bigint key shifts by i*1e9 and
  * every int dimension key by i*1e6, so relational joins/aggregates scale
  * linearly (each replica joins only with itself — exactly how a larger TPC-H
  * SF behaves). Document PAYLOADS are left identical across replicas, so
  * every doc becomes an R-clique of true near-duplicates — the worst case
  * for dedup/similarity candidate generation, which is the point of the
  * stress. Event timestamps are unchanged: time-window densities grow
  * R-fold, stressing window/sessionize states.
  *
  * EMBEDDING payloads (r09, the verdict's clique-corpus fix): replica 0 is
  * the base corpus bit-for-bit; replica i>0 multiplies every component by
  * `1 + Amp·u` where u ∈ [-0.5, 0.5) is hash noise keyed on (replica,
  * ORIGINAL vec_id, dim) — `u = ((i·2654435761 + vec_id·31 + j·40503) mod
  * 1000003) / 1000003 - 0.5`, Amp = 0.1 — fully deterministic and
  * derivable by any engine (integer hash, one multiply). Replicated
  * vectors stay near-duplicates of their base (cosine ≥ ~0.999, so the
  * dedup stress keeps its clique) but exact ties are BROKEN: 10x recall
  * measures index quality, not duplicate tie-breaking.
  *
  * Output layout is R files per table (round-robin repartition) because
  * single-file single-row-group parquet serializes fan-out scans onto one
  * core (the round-5 harness artifact documented in STRESS_sf1_r05.json);
  * a real cluster table is always many files.
  */
object StressGen {
  private val LONG_OFF = 1000000000L // > any base bigint key
  private val INT_OFF  = 1000000     // > any base int dim key

  /** Relative perturbation amplitude for replica embeddings (±5%). */
  val PerturbAmp = 0.1

  /** Deterministic per-replica embedding perturbation (see object doc).
    * Applied BEFORE the key shift so the noise is keyed on the original
    * vec_id; replica 0 passes through untouched. */
  def perturbEmbedding(df: DataFrame, i: Int): DataFrame =
    if (i == 0) df
    else df.withColumn("embedding", expr(
      s"""transform(embedding, (x, j) -> cast(x * (1.0D + $PerturbAmp *
         |  (cast(($i * 2654435761L + vec_id * 31L + j * 40503L) % 1000003L
         |        AS DOUBLE) / 1000003.0D - 0.5D)) AS FLOAT))""".stripMargin))

  /** Union of R key-shifted copies of `df`; `pre` transforms each replica
    * before its keys shift (embedding perturbation). */
  private def replicate(df: DataFrame, reps: Int,
                        longKeys: Seq[String], intKeys: Seq[String],
                        pre: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    (0 until reps).map { i =>
      val shifted = longKeys.foldLeft(pre(df, i))((d, k) =>
        d.withColumn(k, col(k) + lit(i * LONG_OFF)))
      intKeys.foldLeft(shifted)((d, k) =>
        d.withColumn(k, col(k) + lit(i * INT_OFF)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val reps   = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.lift(1).getOrElse(s"/tmp/sf$reps")
    val srcDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // tolerate any historical events.ts encoding on read (see Tables.events,
      // which adapts; this conf only matters for the legacy nanos corpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // table -> (bigint keys to shift, int keys to shift)
    val tables: Seq[(String, Seq[String], Seq[String])] = Seq(
      ("region",     Nil,                                        Seq("r_regionkey")),
      ("nation",     Nil,                                        Seq("n_nationkey", "n_regionkey")),
      ("customer",   Seq("c_custkey"),                           Seq("c_nationkey")),
      ("supplier",   Seq("s_suppkey"),                           Seq("s_nationkey")),
      ("part",       Seq("p_partkey"),                           Nil),
      ("orders",     Seq("o_orderkey", "o_custkey"),             Nil),
      ("lineitem",   Seq("l_orderkey", "l_partkey", "l_suppkey"), Nil),
      ("events",     Seq("event_id", "user_id"),                 Nil),
      ("documents",  Seq("doc_id"),                              Nil),
      ("embeddings", Seq("vec_id"),                              Nil))

    require(reps > 0 && reps.toLong <= Long.MaxValue / LONG_OFF
        && reps.toLong * INT_OFF <= Int.MaxValue,
      s"reps=$reps would overflow the key-shift offsets")

    tables.foreach { case (name, longKeys, intKeys) =>
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      // Disjointness guard: a base key >= its offset would collide replica i
      // with replica i+1 and silently break the linear-scaling premise.
      val keyMax: Map[String, Long] =
        if (longKeys.isEmpty && intKeys.isEmpty) Map.empty
        else {
          val aggs = (longKeys ++ intKeys).map(k => max(col(k).cast("long")).as(k))
          val row  = src.agg(aggs.head, aggs.tail: _*).first()
          (longKeys ++ intKeys).map(k => k -> row.getAs[Long](k)).toMap
        }
      longKeys.foreach(k => require(keyMax(k) < LONG_OFF,
        s"$name.$k max=${keyMax(k)} >= LONG_OFF=$LONG_OFF: replicas would overlap"))
      intKeys.foreach(k => require(keyMax(k) < INT_OFF,
        s"$name.$k max=${keyMax(k)} >= INT_OFF=$INT_OFF: replicas would overlap"))
      val pre: (DataFrame, Int) => DataFrame =
        if (name == "embeddings") perturbEmbedding else (d, _) => d
      replicate(src, reps, longKeys, intKeys, pre)
        .repartition(reps)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"$name: ${reps}x -> $outDir/$name.parquet")
    }
    spark.stop()
  }
}
