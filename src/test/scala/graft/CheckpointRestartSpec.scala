package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.{Upsert, UpsertOut}

/** Fault-tolerance proof for the stateful streaming path: a streamingUpsert
  * query is killed halfway through its script and RESTARTED from its
  * checkpoint. The restarted query must (a) resume with the state store
  * contents the first incarnation committed — replays of pre-kill ops must
  * come back `stale` with the pre-kill version, which is impossible if state
  * was rebuilt from scratch — and (b) produce, together with the pre-kill
  * output, exactly the output of an uninterrupted run of the same script,
  * with nothing double-emitted across the kill boundary. The sink is the
  * parquet FILE sink (memory sink refuses checkpoint recovery by design):
  * its _spark_metadata commit log is what makes restart exactly-once, so the
  * spec exercises the same sink a production job would recover through.
  */
class CheckpointRestartSpec extends SparkSpec {
  import spark.implicits._

  // Script: 40 ops over 5 keys, every 7th a delete; batch 2 replays one op
  // from each pre-kill batch (seq 5 and 15) — those are the state probes.
  private def op(seq: Long) =
    Upsert(seq % 5 + 1, seq, if (seq % 7 == 0) "delete" else "upsert", s"p$seq")
  private val b0 = (1L to 10L).map(op)
  private val b1 = (11L to 20L).map(op)
  private val b2 = (21L to 30L).map(op) ++ Seq(op(5L), op(15L))
  private val b3 = (31L to 40L).map(op)

  private def sinkRows(dir: String): Seq[(Long, Long, String, Long)] =
    spark.read.schema(implicitly[org.apache.spark.sql.Encoder[UpsertOut]].schema)
      .parquet(dir).as[UpsertOut].collect().toSeq
      .map(u => (u.key, u.seq, u.action, u.version))

  test("streamingUpsert survives a mid-script kill + checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext

    // uninterrupted reference run, same batch boundaries
    val refIn = MemoryStream[Upsert]
    val refQ = Streams.streamingUpsert(refIn.toDS()).toDF()
      .writeStream.format("memory").queryName("cp_ref")
      .outputMode(OutputMode.Append()).start()
    Seq(b0, b1, b2, b3).foreach { b => refIn.addData(b: _*); refQ.processAllAvailable() }
    refQ.stop()
    val ref = spark.table("cp_ref").as[UpsertOut].collect().toSeq
      .map(u => (u.key, u.seq, u.action, u.version))

    // incarnation 1: checkpointed file sink, killed after committing b0 + b1
    val cp = Files.createTempDirectory("graft_cp").toString
    val sink = Files.createTempDirectory("graft_cp_sink").toString
    val input = MemoryStream[Upsert]
    def start() = Streams.streamingUpsert(input.toDS()).toDF()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    input.addData(b0: _*); q1.processAllAvailable()
    input.addData(b1: _*); q1.processAllAvailable()
    q1.stop() // the kill: b2/b3 never reach incarnation 1
    val out1 = sinkRows(sink)

    // incarnation 2: same source, sink, and checkpoint
    val q2 = start()
    input.addData(b2: _*); q2.processAllAvailable()
    input.addData(b3: _*); q2.processAllAvailable()
    q2.stop()
    val all = sinkRows(sink)
    val out2 = diffMultiset(all, out1)

    // (a) state survived: the replayed pre-kill ops are stale AT the version
    // the first incarnation left behind (fresh state would re-insert at v1)
    val probe5 = out2.filter(r => r._2 == 5L && r._3 == "stale")
    val probe15 = out2.filter(r => r._2 == 15L && r._3 == "stale")
    assert(probe5.nonEmpty && probe15.nonEmpty, s"replays not stale: $out2")
    val v5before = out1.filter(r => r._1 == 5L % 5 + 1).map(_._4).max
    assert(probe5.head._4 == v5before, "stale replay must carry the pre-kill version")

    // (b) kill+restart output == uninterrupted output, nothing double-emitted
    assert(all.sorted == ref.sorted)
    assert(out1.size + out2.size == all.size)
  }

  test("streamingAsof survives a mid-script kill + checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    import graft.streaming.Streams.{AsofOut, Event}
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), uid, typ, v)
    // pre-kill: user 1's click history ends at id=3; post-kill purchase 5
    // can only attribute to it if the state store was recovered
    val a0 = Seq(ev(1, "2024-01-01 09:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 09:30:00", 1, "purchase", 0.0))
    val a1 = Seq(ev(3, "2024-01-01 10:00:00", 1, "click", 3.0),
      ev(4, "2024-01-01 10:10:00", 2, "purchase", 0.0)) // no prior click: drops
    val a2 = Seq(ev(5, "2024-01-01 11:00:00", 1, "purchase", 0.0))
    val a3 = Seq(ev(6, "2024-01-01 11:30:00", 1, "click", 6.0),
      ev(7, "2024-01-01 12:00:00", 1, "purchase", 0.0))

    def rows(dir: String): Seq[(Long, Long, Double)] =
      spark.read.schema(implicitly[org.apache.spark.sql.Encoder[AsofOut]].schema)
        .parquet(dir).as[AsofOut].collect().toSeq
        .map(o => (o.purchase_id, o.click_id, o.click_value))

    val cp = Files.createTempDirectory("graft_asof_cp").toString
    val sink = Files.createTempDirectory("graft_asof_sink").toString
    val input = MemoryStream[Event]
    def start() = Streams.streamingAsof(input.toDS()).toDF()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    input.addData(a0: _*); q1.processAllAvailable()
    input.addData(a1: _*); q1.processAllAvailable()
    q1.stop() // the kill
    val out1 = rows(sink)
    assert(out1.toSet == Set((2L, 1L, 1.0)), s"pre-kill output wrong: $out1")

    val q2 = start()
    input.addData(a2: _*); q2.processAllAvailable()
    input.addData(a3: _*); q2.processAllAvailable()
    q2.stop()
    val all = rows(sink)
    // purchase 5 attributed to PRE-KILL click 3: impossible without the
    // recovered state cell; purchase 7 to the post-restart click 6; nothing
    // double-emitted across the kill boundary
    assert(all.sorted == Seq((2L, 1L, 1.0), (5L, 3L, 3.0), (7L, 6L, 6.0)).sorted,
      s"restart output wrong: $all")
  }

  test("streamingAsofOoo survives a kill: watermark, buffers, AND timeouts recover") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    import graft.streaming.Streams.{AsofOut, Event}
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), uid, typ, v)
    // pre-kill: user 1's purchase arrives BEFORE its attributing click;
    // user 2 buffers a click+purchase then goes silent forever — its flush
    // after the restart can only come from a RECOVERED EventTimeTimeout
    val a0 = Seq(ev(10, "2024-01-01 09:30:00", 1, "purchase", 0.0),
      ev(11, "2024-01-01 08:00:00", 2, "click", 2.0))
    val a1 = Seq(ev(12, "2024-01-01 09:00:00", 1, "click", 7.0), // late click, must win
      ev(13, "2024-01-01 08:30:00", 2, "purchase", 0.0))
    // post-kill: user-1-only traffic advances the watermark; user 2 stays quiet
    val a2 = Seq(ev(14, "2024-01-02 12:00:00", 1, "click", 9.0))
    val a3 = Seq(ev(15, "2024-01-02 13:00:00", 1, "click", 9.5))

    def rows(dir: String): Seq[(Long, Long)] =
      spark.read.schema(implicitly[org.apache.spark.sql.Encoder[AsofOut]].schema)
        .parquet(dir).as[AsofOut].collect().toSeq
        .map(o => (o.purchase_id, o.click_id))

    val cp = Files.createTempDirectory("graft_ooo_cp").toString
    val sink = Files.createTempDirectory("graft_ooo_sink").toString
    val input = MemoryStream[Event]
    def start() = Streams.streamingAsofOoo(input.toDS(), watermarkDelay = "2 hours").toDF()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    input.addData(a0: _*); q1.processAllAvailable()
    input.addData(a1: _*); q1.processAllAvailable()
    q1.stop() // the kill: both purchases still pending (watermark at 07:30)
    assert(rows(sink).isEmpty, "nothing may emit before the watermark passes the purchases")

    val q2 = start()
    input.addData(a2: _*); q2.processAllAvailable()
    input.addData(a3: _*); q2.processAllAvailable()
    q2.stop()
    // 10→12: pre-kill purchase matched by the pre-kill late click — both
    // crossed the restart in the state store. 13→11: user 2 sent NOTHING
    // post-restart, so its emission required the recovered buffered pair
    // plus a recovered (or re-registered) event-time timeout firing on the
    // post-restart watermark.
    assert(rows(sink).sorted == Seq((10L, 12L), (13L, 11L)).sorted,
      s"restart output wrong: ${rows(sink)}")
  }

  /** Multiset difference a − b (Seq#diff is already multiset-aware). */
  private def diffMultiset[T](a: Seq[T], b: Seq[T]): Seq[T] = a.diff(b)
}
