package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Output-bound stress runner: times each named query AND records its output
  * row count, so the "runtime sublinear per output row" claim for the dedup
  * family is measured, not argued (StressGen replicas make every doc an
  * R-clique of true near-dups — pair outputs grow ~R²/2 by construction,
  * which is the point). Test-scope tool:
  *
  *   sbt "Test/runMain graft.StressOut <sfDir> <outJson> <q1,q2,...>"
  */
object StressOut {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.sources.Tables.documents(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => () }
    val recs = names.toSeq.map { name =>
      val fn = SparkEntry.queries(name)
      // Count at the RDD level: executes the query's full physical plan
      // (a Dataset.count() would let the optimizer prune columns/aggregates,
      // timing a cheaper plan than the query actually runs).
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      // r14 verdict item 5 (stress-board hygiene): a *_store/_cycle2 row's
      // first call pays the one-time ingest-side store build, which made
      // rows like bm25_upsert_store 15.0 s vs inline 4.9 s unreadable.
      // Run twice: "sec" = the warm steady-state serving cost (the number
      // comparable against inline rungs), "sec_cold" = first call,
      // "sec_store_build" = their difference ≈ the ingest build.
      val (cold, rows) = once()
      val (warm, _) = once()
      val build = math.max(0.0, cold - warm)
      println(f"$name%-22s cold $cold%8.2f s  warm $warm%8.2f s  $rows%12d rows")
      def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      s""""$name":{"sec":${f3(warm)},"sec_cold":${f3(cold)},"sec_store_build":${f3(build)},"rows":$rows}"""
    }
    val json = s"""{"sf":"$sfDir","queries":${recs.mkString("{", ",", "}")}}"""
    Files.write(Paths.get(out), (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
