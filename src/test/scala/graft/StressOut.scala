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
      val t0 = System.nanoTime()
      // Count at the RDD level: executes the query's full physical plan
      // (a Dataset.count() would let the optimizer prune columns/aggregates,
      // timing a cheaper plan than the query actually runs).
      val rows = fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s $sec%8.2f s  $rows%12d rows")
      s""""$name":{"sec":${BigDecimal(sec).setScale(3, BigDecimal.RoundingMode.HALF_UP)},"rows":$rows}"""
    }
    val json = s"""{"sf":"$sfDir","queries":${recs.mkString("{", ",", "}")}}"""
    Files.write(Paths.get(out), (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
