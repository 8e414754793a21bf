package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.Event

/** The production state-store config must actually drive a stateful query:
  * a wrong provider class name would otherwise only fail at deploy time. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  test("stateful aggregation runs under the RocksDB state store") {
    Streams.productionStateStoreConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      input.addData(
        Event(1, Timestamp.valueOf("2024-01-01 00:05:00"), 10, "click", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 00:10:00"), 10, "click", 2.0))
      val q = Streams.windowAgg(input.toDF())
        .writeStream.format("memory").queryName("rocksagg")
        .outputMode(OutputMode.Append()).start()
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 03:00:00"), 10, "view", 4.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("rocksagg")
        .select("event_type", "n").as[(String, Long)].collect().toSet
      assert(rows.contains(("click", 2L)))
    } finally Streams.productionStateStoreConf.keys.foreach(spark.conf.unset)
  }
}
