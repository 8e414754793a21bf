package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Throwaway timing probe for the StreamReplay fixed costs (not a spec). */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("warmup lineitem")(graft.sources.Tables.lineitem(spark, dir).count())
    val ev = t("collect+sort script") {
      graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Event].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    }
    val n = ev.length
    val batches = (0 until 4).map(i => ev.slice(i * n / 4, (i + 1) * n / 4))
    val parts = if (args.length > 1) args(1) else "4"
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    for (rep <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val input = MemoryStream[Event]
      val name = s"probe_join_$rep"
      val q = t(s"rep$rep start()") {
        val clicksJoin = { df: org.apache.spark.sql.DataFrame =>
          val clicks = df.filter(col("event_id") % 3 =!= 0)
          val purchases = df.filter(col("event_id") % 3 === 0)
          Streams.clickAttributionJoin(clicks, purchases)
        }
        clicksJoin(input.toDF()).writeStream.format("memory").queryName(name)
          .option("checkpointLocation", s"/dev/shm/probe_ckpt_$rep")
          .outputMode(OutputMode.Append()).start()
      }
      batches.zipWithIndex.foreach { case (b, i) =>
        t(s"rep$rep batch$i addData+processAll") {
          input.addData(b: _*)
          q.processAllAvailable()
        }
      }
      q.recentProgress.foreach { p =>
        println(s"[probe] rep$rep progress batch=${p.batchId} " +
          s"durTotal=${p.durationMs} rows=${p.numInputRows}")
      }
      t(s"rep$rep stop()")(q.stop())
      t(s"rep$rep collect sink")(spark.table(name).count())
      spark.catalog.dropTempView(name)
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    spark.stop()
  }
}
