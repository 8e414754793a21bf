package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Eviction-policy ablation for the capped streaming near-dedup (r11/r12
  * verdict item 7): retain-first vs deterministic reservoir, pair-COVERAGE
  * against the uncapped batch pair set on a stress corpus.
  *
  *   sbt "Test/runMain graft.EvictionProbe <docsDir> [cap]"
  *
  * Coverage = |policy pairs| / |uncapped pairs| (both policies only ever
  * emit true bucket-sharing pairs, so policy ⊆ uncapped and the ratio IS
  * the recall of the bounded form). Prints one JSON line for SCALING.md. */
object EvictionProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cap = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(cap == 32, "replay variants are wired at the registered cap=32")
    val docs = graft.sources.Tables.documents(spark, dir)
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (full, tFull) = t(graft.operators.MinhashPortable.minhashLshPortable(docs)
      .select(col("doc_a"), col("doc_b")).distinct().count())
    val (rf, tRf) = t(graft.streaming.StreamReplay.streamNearDedup(spark, dir)
      .select(col("doc_a"), col("doc_b")).distinct().count())
    val (rsv, tRsv) = t(graft.streaming.StreamReplay
      .streamNearDedupReservoir(spark, dir)
      .select(col("doc_a"), col("doc_b")).distinct().count())
    def f(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"eviction","dir":"$dir","cap":$cap,""" +
      s""""full_pairs":$full,"retain_first":$rf,"reservoir":$rsv,""" +
      s""""coverage_rf":${f(rf.toDouble / full)},"coverage_rsv":${f(rsv.toDouble / full)},""" +
      s""""sec_full":${f(tFull)},"sec_rf":${f(tRf)},"sec_rsv":${f(tRsv)}}""")
    spark.stop()
  }
}
