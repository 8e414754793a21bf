package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, MinhashPortable, ResolveInc}

/** A/B probe for the maintained dedup pair/cluster table (r11/r12 verdict
  * item 2 "done" bar): at a stress tier, the incremental path — standing
  * state LOADED from parquet, one arrival batch + one departure batch
  * maintained through resolveIncFrom — must beat the full re-resolve of
  * the post-change corpus (the ~535 s full LSH pass at 100×, r11).
  *
  *   sbt "Test/runMain graft.ResolveIncProbe <docsDir> [stateDir] [mod]"
  *
  * `mod` sets the batch density: arrivals = doc_id%mod==0, departures =
  * doc_id%mod==5. The default 10 makes both batches touch EVERY replica
  * clique (worst case: the scoped relabel degenerates to full CC); a
  * large mod (e.g. 1000) is the production shape — departures touch a
  * bounded component set, so the relabel is O(touched) and the A/B
  * isolates the avoided re-sketch + re-pair of the standing corpus.
  *
  * The standing-state build is written ONCE (reused across runs) and
  * timed separately — it is the ingest job, not the loop. Prints one JSON
  * line for SCALING.md. */
object ResolveIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val mod = args.lift(2).map(_.toLong).getOrElse(10L)
    val stateDir = args.lift(1).filter(_ != "-").getOrElse(
      "/tmp/graft_resolveinc_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
        (if (mod == 10L) "" else s"_m$mod"))
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
    val docs = graft.sources.Tables.documents(spark, dir)
    val isArrival = pmod(col("doc_id"), lit(mod)) === 0L
    val isDeparture = pmod(col("doc_id"), lit(mod)) === 5L

    // --- standing state: build once, reuse across probe runs ---
    // the marker records the mod the state was built for: an explicitly
    // passed stateDir reused with a different mod would otherwise silently
    // serve a base slice built for another batch density (r13 advice)
    val marker = new java.io.File(s"$stateDir/_BUILT")
    val markerStale = marker.exists() && {
      val recorded = scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(marker.toPath)).trim.toLong)
      recorded.toOption != Some(mod)
    }
    val (_, tBuild) = t {
      if (!marker.exists() || markerStale) {
        val base = docs.filter(!isArrival)
        val sig = MinhashPortable.minhashPortable(base)
        sig.write.mode("overwrite").parquet(s"$stateDir/sig")
        val sigT = spark.read.parquet(s"$stateDir/sig")
        MinhashPortable.bandKeys(sigT, 4)
          .write.mode("overwrite").parquet(s"$stateDir/keys")
        val keysT = spark.read.parquet(s"$stateDir/keys")
        val pairs = MinhashPortable.pairsFromIndex(sigT, keysT)
        pairs.write.mode("overwrite").parquet(s"$stateDir/pairs")
        GraphOps.labelPropagation(spark.read.parquet(s"$stateDir/pairs")
            .select(col("doc_a").as("src"), col("doc_b").as("dst")))
          .write.mode("overwrite").parquet(s"$stateDir/labels")
        java.nio.file.Files.write(marker.toPath, mod.toString.getBytes)
      }
    }
    def ld(n: String): DataFrame = spark.read.parquet(s"$stateDir/$n")

    // --- A: incremental maintenance from the loaded standing state ---
    val (nInc, tInc) = t {
      ResolveInc.resolveIncFrom(ld("sig"), ld("keys"), ld("pairs"), ld("labels"),
        docs.filter(isArrival), docs.filter(isDeparture).select(col("doc_id")))
        .count()
    }
    // --- B: full re-resolve of the post-change corpus from scratch ---
    val (nFull, tFull) = t {
      val post = docs.filter(!isDeparture)
      val sig = MinhashPortable.minhashPortable(post)
      val pairs = MinhashPortable.pairsFromIndex(sig,
        MinhashPortable.bandKeys(sig, 4))
      GraphOps.labelPropagation(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        .count()
    }
    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"resolve_inc","dir":"$dir","mod":$mod,"rows_inc":$nInc,"rows_full":$nFull,""" +
      s""""sec_build_state":${f(tBuild)},"sec_incremental":${f(tInc)},""" +
      s""""sec_full_reresolve":${f(tFull)},"speedup":${f(tFull / tInc)}}""")
    spark.stop()
  }
}
