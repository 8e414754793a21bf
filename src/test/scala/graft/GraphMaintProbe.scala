package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall + A/B probe for the graph-ANN MAINTENANCE directions (r14): at a
  * corpus dir, measure (a) recall@3 of the search over the MAINTAINED
  * graph (upsert: base graph + arrival batch repaired in; delete: full
  * graph with departures dropped + re-filled) against exact knn over the
  * post-change corpus, next to the FROM-SCRATCH rebuild's recall on the
  * same corpus — the "recall unchanged" done-bar; and (b) the store A/B
  * (persisted standing graph vs inline rebuild) isolating maintenance
  * cost from build cost.
  *
  *   sbt "Test/runMain graft.GraphMaintProbe <embDir>"
  */
object GraphMaintProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val embSurv = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L)
    // --- upsert: maintained vs rebuilt, on the full (post-arrival) corpus
    val exactFull = graft.operators.Search.knnJoin(emb, nProbes = 10, k = 3)
    val (rUp, tUpInline) = t(graft.operators.Recall.recallAtK(exactFull,
      graft.operators.GraphAnn.annGraphUpsert(emb)))
    val (rRebuild, tRebuild) = t(graft.operators.Recall.recallAtK(exactFull,
      graft.operators.GraphAnn.annGraphSearch(emb)))
    // the production standing graph is the WIDE build (ann_graph_wide's
    // kBuild=32 — the r13 lesson that closed 10× build quality): upsert
    // over it measures the maintained path at production index quality
    val (rUpWide, _) = t(graft.operators.Recall.recallAtK(exactFull,
      graft.operators.GraphAnn.annGraphUpsertFrom(
        graft.operators.GraphAnn.knnGraph(
          emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L), kBuild = 32),
        emb)))
    val (rRebuildWide, _) = t(graft.operators.Recall.recallAtK(exactFull,
      graft.operators.GraphAnn.annGraphSearch(emb, kBuild = 32)))
    // store A/B: rep 1 pays the base-graph build, rep 2 is maintenance+search
    val (_, tUpStoreCold) = t(
      graft.sources.Stores.annGraphUpsertStore(spark, dir).count())
    val (_, tUpStoreWarm) = t(
      graft.sources.Stores.annGraphUpsertStore(spark, dir).count())
    // --- delete: maintained vs rebuilt, on the survivor corpus
    val exactSurv = graft.operators.Search.knnJoin(embSurv, nProbes = 10, k = 3)
    val (rDel, _) = t(graft.operators.Recall.recallAtK(exactSurv,
      graft.operators.GraphAnn.annGraphDelete(emb)))
    val (rDelRebuild, _) = t(graft.operators.Recall.recallAtK(exactSurv,
      graft.operators.GraphAnn.annGraphSearch(embSurv)))
    val (_, tDelStoreCold) = t(
      graft.sources.Stores.annGraphDeleteStore(spark, dir).count())
    val (_, tDelStoreWarm) = t(
      graft.sources.Stores.annGraphDeleteStore(spark, dir).count())
    def f(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"graph_maint","dir":"$dir",""" +
      s""""recall_upsert":${f(rUp)},"recall_rebuild":${f(rRebuild)},""" +
      s""""recall_upsert_wide":${f(rUpWide)},"recall_rebuild_wide":${f(rRebuildWide)},""" +
      s""""recall_delete":${f(rDel)},"recall_delete_rebuild":${f(rDelRebuild)},""" +
      s""""sec_upsert_inline":${f(tUpInline)},"sec_rebuild":${f(tRebuild)},""" +
      s""""sec_upsert_store_cold":${f(tUpStoreCold)},"sec_upsert_store_warm":${f(tUpStoreWarm)},""" +
      s""""sec_delete_store_cold":${f(tDelStoreCold)},"sec_delete_store_warm":${f(tDelStoreWarm)}}""")
    spark.stop()
  }
}
