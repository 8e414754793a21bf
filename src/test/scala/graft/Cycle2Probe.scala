package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GraphAnn, GraphOps, Search}
import graft.sources.{Stores, Tables}

/** A/B probe for the write-back cycle matrix: at a stress tier, per index
  * family, measure (a) the COLD path — cycle-1 maintenance + catalog
  * write-back + cycle-2 serve, i.e. one full day-2 turn including the
  * ingest-side standing-state builds; (b) the WARM path — cycle 2 served
  * from the already-persisted updated store (the steady-state batch
  * cost); and (c) the from-scratch recompute of the post-both-batches
  * result (what a deployment without maintained stores pays every
  * batch). The warm/scratch ratio is the value of keeping stores live
  * across cycles.
  *
  *   sbt "Test/runMain graft.Cycle2Probe <dir> [families]"
  *
  * families: comma-list of bm25,cc,ivf,ivfpq,semdedup,graph (default all). */
object Cycle2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val fams = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("bm25", "cc", "ivf", "ivfpq", "semdedup", "graph"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }
    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def d20(c: String) = pmod(col(c), lit(20L))

    def report(fam: String, cold: Double, warm: Double, scratch: Double,
               rows: Long): Unit =
      println(s"""{"probe":"cycle2","family":"$fam","dir":"$dir",""" +
        s""""sec_cold_writeback":${f(cold)},"sec_warm_cycle2":${f(warm)},""" +
        s""""sec_scratch":${f(scratch)},"rows":$rows,""" +
        s""""speedup_vs_scratch":${f(scratch / warm)}}""")

    if (fams("bm25")) {
      val (n, cold) = t(Stores.bm25Cycle2Store(spark, dir, SparkEntry.kwTerms).count())
      val (_, warm) = t(Stores.bm25Cycle2Store(spark, dir, SparkEntry.kwTerms).count())
      val (_, scratch) = t {
        val docs = Tables.documents(spark, dir).filter(!d20("doc_id").isin(5L, 15L))
        val (post, dl) = Search.bm25IndexParts(docs)
        val dfM = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val scM = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        Search.bm25SearchFrom(post, dl, dfM, scM, SparkEntry.kwTerms).count()
      }
      report("bm25", cold, warm, scratch, n)
    }
    if (fams("cc")) {
      val (n, cold) = t(Stores.componentsCycle2Store(spark, dir).count())
      val (_, warm) = t(Stores.componentsCycle2Store(spark, dir).count())
      val (_, scratch) = t(
        GraphOps.connectedComponents(Tables.lineitem(spark, dir)).count())
      report("cc", cold, warm, scratch, n)
    }
    if (fams("ivf")) {
      val (n, cold) = t(Stores.ivfCycle2Store(spark, dir).count())
      val (_, warm) = t(Stores.ivfCycle2Store(spark, dir).count())
      val (_, scratch) = t {
        val emb = Tables.embeddings(spark, dir)
        val idx = Dedup.ivfAssign(emb.filter(!d20("vec_id").isin(5L, 15L)),
          Dedup.frozenCents(emb, 16))
        Dedup.ivfDeleteFrom(idx, emb.filter(lit(false)).select(col("vec_id"))).count()
      }
      report("ivf", cold, warm, scratch, n)
    }
    if (fams("ivfpq")) {
      import graft.operators.ProductQuant
      val (n, cold) = t(Stores.ivfPqCycle2Store(spark, dir).count())
      val (_, warm) = t(Stores.ivfPqCycle2Store(spark, dir).count())
      val (_, scratch) = t {
        val emb = Tables.embeddings(spark, dir)
        val codes = ProductQuant.ivfPqEncodeSlice(
          emb.filter(!d20("vec_id").isin(5L, 15L)), emb)
        ProductQuant.ivfPqDeleteFrom(emb, codes,
          emb.filter(lit(false)).select(col("vec_id"))).count()
      }
      report("ivfpq", cold, warm, scratch, n)
    }
    if (fams("semdedup")) {
      import graft.operators.Cluster
      val (n, cold) = t(Stores.semdedupCycle2Store(spark, dir).count())
      val (_, warm) = t(Stores.semdedupCycle2Store(spark, dir).count())
      val (_, scratch) = t {
        val emb = Tables.embeddings(spark, dir)
        val cents = Cluster.trainCentroids(emb, Cluster.scaledK(emb), iters = 1)
        Cluster.semdedupPairsFrom(
          Cluster.assignUnder(emb.filter(!d20("vec_id").isin(5L, 15L)), cents))
          .count()
      }
      report("semdedup", cold, warm, scratch, n)
    }
    if (fams("graph")) {
      val (n, cold) = t(Stores.annGraphCycle2Store(spark, dir).count())
      val (_, warm) = t(Stores.annGraphCycle2Store(spark, dir).count())
      val (_, scratch) = t(
        GraphAnn.annGraphSearch(Tables.embeddings(spark, dir)).count())
      report("graph", cold, warm, scratch, n)
    }
    spark.stop()
  }
}
