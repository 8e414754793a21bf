package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Skew probe for the as-of operators: remap half of all user_ids onto ONE
  * hot user (every event with an even user_id lands on user 999999), then
  * time the custom-exec and window formulations on the skewed feed. The
  * claim under test: AsofJoinExec's per-partition merge holds O(1) state
  * and streams the hot key's whole history through one partition in a
  * single pass — so skew costs only the sort of that partition, exactly
  * like the window formulation, with no per-key buffering blowup. Usage:
  *
  *   sbt "Test/runMain graft.AsofSkewProbe [sfDir] [reps]"
  */
object AsofSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.sources.Tables.events(spark, dir)
    val skewed = events.withColumn("user_id",
      when(col("user_id") % 2 === 0, lit(999999L)).otherwise(col("user_id")))
    val hotShare = skewed.filter(col("user_id") === 999999L).count().toDouble /
      skewed.count()
    println(f"[skew] hot-user share of events: ${hotShare * 100}%.1f%%")

    def med(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val m = ts.map(_._1).sorted.apply(reps / 2)
      println(f"[skew] $label: median $m%.2f s over $reps reps (rows=${ts.head._2})")
    }
    med("exec uniform")(AsOf.purchaseAttributionExec(events).count())
    med("exec skewed")(AsOf.purchaseAttributionExec(skewed).count())
    med("window uniform")(AsOf.purchaseAttribution(events).count())
    med("window skewed")(AsOf.purchaseAttribution(skewed).count())
    // cross-check: the two formulations agree on the skewed feed too
    val ex = AsOf.purchaseAttributionExec(skewed)
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"))
    val win = AsOf.purchaseAttribution(skewed)
    val diff = ex.exceptAll(win).count() + win.exceptAll(ex).count()
    println(s"[skew] exec-vs-window disagreement on skewed feed: $diff rows")
    spark.stop()
  }
}
