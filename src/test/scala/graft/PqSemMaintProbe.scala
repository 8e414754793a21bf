package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Cluster, ProductQuant}
import graft.sources.{Stores, Tables}

/** A/B probe for the r14-session-3 maintenance rungs at a stress tier.
  *
  * Per family, three numbers:
  *   - sec_maint  — the maintenance rung itself (delta emission / keyed
  *     drop; store-backed form where one exists, after the store build
  *     is paid: the steady-state daily cost);
  *   - sec_store_build — the one-time ingest-side standing-state build
  *     (first call, includes catalog write);
  *   - sec_scratch — what a deployment WITHOUT maintained state pays per
  *     batch: full re-encode / re-train + full restatement.
  *
  *   sbt "Test/runMain graft.PqSemMaintProbe <dir> [families]"
  *
  * families: comma-list of ivfpq,semdedup (default both). */
object PqSemMaintProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val fams = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("ivfpq", "semdedup", "hier"))
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
    def report(fam: String, rung: String, build: Double, maint: Double,
               scratch: Double, rows: Long): Unit =
      println(s"""{"probe":"pqsem_maint","family":"$fam","rung":"$rung",""" +
        s""""dir":"$dir","sec_store_build":${f(build)},"sec_maint":${f(maint)},""" +
        s""""sec_scratch":${f(scratch)},"rows":$rows,""" +
        s""""speedup_vs_scratch":${f(scratch / maint)}}""")

    if (fams("ivfpq")) {
      val emb = Tables.embeddings(spark, dir)
      // store build (one-time ingest cost, includes the catalog write)
      val (_, build) = t(Stores.ivfPqCodesStore(spark, dir).count())
      // steady-state delete from the persisted codes
      val (n, maint) = t(Stores.ivfPqDeleteStore(spark, dir).count())
      // no-store deployment: full per-batch corpus encode + search
      val (_, scratch) = t(ProductQuant.ivfPqDelete(emb).count())
      report("ivfpq", "delete_store", build, maint, scratch, n)
    }
    if (fams("semdedup")) {
      // store build: frozen base-trained cents + base partition
      val (_, build) = t {
        Stores.semdedupCentsBase(spark, dir).count()
        Stores.semdedupBaseClusters(spark, dir).count()
      }
      // steady-state arrival batch: assign under the persisted model,
      // emit only the created pairs
      val (n, maint) = t(Stores.semdedupUpsertStore(spark, dir).count())
      // no-store deployment: re-train + restate the FULL post-upsert
      // pair set every batch
      val (_, scratch) = t {
        val emb = Tables.embeddings(spark, dir)
        val base = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L)
        val cents = Cluster.trainCentroids(base, Cluster.scaledK(base), iters = 1)
        Cluster.semdedupPairsFrom(Cluster.assignUnder(emb, cents)).count()
      }
      report("semdedup", "upsert_store", build, maint, scratch, n)
      // prepay the full-corpus partition store the delete rung reads —
      // the ingest-side build, not the daily batch cost
      val (_, buildD) = t(Stores.semdedupClusters(spark, dir).count())
      val (n2, maintD) = t(Stores.semdedupDeleteStore(spark, dir).count())
      val (_, scratchD) = t {
        val emb = Tables.embeddings(spark, dir)
        val cents = Cluster.trainCentroids(emb, Cluster.scaledK(emb), iters = 1)
        Cluster.semdedupPairsFrom(
          Cluster.assignUnder(emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L),
            cents)).count()
      }
      report("semdedup", "delete_store", buildD, maintD, scratchD, n2)
    }
    if (fams("hier")) {
      // store read path: two-level train paid once at ingest, the pair
      // join served exchange-free vs the inline per-call two-level train
      val (_, build) = t(Stores.semdedupHierClusters(spark, dir).count())
      val (n, maint) = t(Stores.semdedupHierStore(spark, dir).count())
      val (_, scratch) = t(
        Cluster.semdedupHier(Tables.embeddings(spark, dir)).count())
      report("semdedup_hier", "store", build, maint, scratch, n)
      // delta emission vs full restatement (both gate-coverage forms
      // paying their train in-call): the upsert emits created pairs only
      val (n2, up) = t(
        Cluster.semdedupHierUpsert(Tables.embeddings(spark, dir)).count())
      report("semdedup_hier", "upsert_vs_restate", 0.0, up, scratch, n2)
      // the production shape: arrivals assigned under the PERSISTED
      // two-level model, created pairs off the persisted base partition
      val (_, buildU) = t(Stores.semdedupHierUpsertStore(spark, dir).count())
      val (n3, maintU) = t(Stores.semdedupHierUpsertStore(spark, dir).count())
      report("semdedup_hier", "upsert_store", buildU, maintU, scratch, n3)
    }
    spark.stop()
  }
}
