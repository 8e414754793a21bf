package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MinhashPortable

/** A/B probe for the LSH upsert EMISSION ceiling (r14 verdict item 1): at
  * a stress tier, compare one maintenance cycle as
  *
  *   A. inline upsert — base + delta sketched in-call, delta-touching
  *      pairs emitted (the r13 gate-coverage shape);
  *   B. store upsert — standing (sig, keys) LOADED from parquet, only the
  *      delta sketched, pairs emitted (r13's measured 1.36× at mod=10:
  *      emission dominated);
  *   C. store CDC delta — same standing state, the O(Δ) changefeed
  *      ('S'/'K' appends + created pairs) emitted instead.
  *
  * `mod` sets the batch density (arrivals = doc_id%mod == 0). mod=10 is
  * the degenerate worst case — the arrival batch is 10% OF THE CORPUS, so
  * created pairs are a constant fraction of the index and emission
  * dominates every shape. mod=1000 is the production shape (the
  * dedup_resolve_inc precedent): a bounded batch against a huge standing
  * corpus, where the avoided base re-sketch and the bounded feed are the
  * whole story. Standing state is built once per (dir, mod) and reused.
  *
  *   sbt "Test/runMain graft.UpsertDeltaProbe <docsDir> [mod]"
  */
object UpsertDeltaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val mod = args.lift(1).map(_.toLong).getOrElse(1000L)
    val stateDir = "/tmp/graft_upsertdelta_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + s"_m$mod"
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
    // full-plan count (StressOut convention): Dataset.count() would let the
    // optimizer prune the emission columns this probe exists to measure
    def full(df: DataFrame): Long = df.queryExecution.toRdd.count()
    val docs = graft.sources.Tables.documents(spark, dir)
    val isArrival = pmod(col("doc_id"), lit(mod)) === 0L

    val marker = new java.io.File(s"$stateDir/_BUILT")
    val (_, tBuild) = t {
      if (!marker.exists()) {
        val sig = MinhashPortable.minhashPortable(docs.filter(!isArrival))
        sig.write.mode("overwrite").parquet(s"$stateDir/sig")
        MinhashPortable.bandKeys(spark.read.parquet(s"$stateDir/sig"), 4)
          .write.mode("overwrite").parquet(s"$stateDir/keys")
        marker.createNewFile()
      }
    }
    def ld(n: String) = spark.read.parquet(s"$stateDir/$n")
    val arrivals = docs.filter(isArrival)

    val (nInline, tInline) = t(full(
      MinhashPortable.minhashLshUpsert(docs, mod = mod)))
    val (nStore, tStore) = t(full(
      MinhashPortable.minhashLshUpsertFrom(ld("sig"), ld("keys"), arrivals)))
    val (nDelta, tDelta) = t(full(
      MinhashPortable.minhashLshUpsertDeltaFrom(ld("sig"), ld("keys"),
        arrivals, mod = mod)))
    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"upsert_delta","dir":"$dir","mod":$mod,""" +
      s""""sec_build_state":${f(tBuild)},""" +
      s""""sec_inline":${f(tInline)},"rows_inline":$nInline,""" +
      s""""sec_store_pairs":${f(tStore)},"rows_store_pairs":$nStore,""" +
      s""""sec_store_delta":${f(tDelta)},"rows_store_delta":$nDelta,""" +
      s""""speedup_delta_vs_inline":${f(tInline / tDelta)}}""")
    spark.stop()
  }
}
