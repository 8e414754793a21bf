package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("streaming windowAgg counts events per hour window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), 10, "click", 1.0),
      Event(2, ts(10), 10, "click", 2.0),
      Event(3, ts(20), 11, "view", 3.0))
    val q = Streams.windowAgg(input.toDF())
      .writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Append()).start()
    input.addData(Event(4, Timestamp.valueOf("2024-01-01 03:00:00"), 10, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("winagg")
      .select("event_type", "n", "sum_value").as[(String, Long, Double)].collect().toSet
    // hour-0 windows close once the watermark passes (3:00 event advances it)
    assert(rows.contains(("click", 2L, 3.0)))
    assert(rows.contains(("view", 1L, 3.0)))
  }

  test("streaming histogram buckets windowed values with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // nb=20, vmax=500 → bucket width 25
    input.addData(
      Event(1, ts(5), 10, "click", 10.0),   // bucket 0
      Event(2, ts(10), 10, "click", 20.0),  // bucket 0
      Event(3, ts(20), 10, "click", 60.0),  // bucket 2
      Event(4, ts(25), 11, "view", 999.0))  // clamps to bucket 19
    val q = Streams.streamingHistogram(input.toDF())
      .writeStream.format("memory").queryName("shist")
      .outputMode(OutputMode.Append()).start()
    input.addData(Event(5, Timestamp.valueOf("2024-01-01 03:00:00"), 10, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("shist")
      .select("event_type", "bucket", "n").as[(String, Long, Long)].collect().toSet
    assert(rows.contains(("click", 0L, 2L)))
    assert(rows.contains(("click", 2L, 1L)))
    assert(rows.contains(("view", 19L, 1L)))
  }

  test("streaming dedup flags duplicates across batches, first arrival wins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Doc]
    val q = Streams.streamingDedup(input.toDS())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    input.addData(Streams.Doc(1, "alpha"), Streams.Doc(2, "beta"), Streams.Doc(3, "alpha"))
    q.processAllAvailable()
    input.addData(Streams.Doc(4, "alpha"), Streams.Doc(5, "gamma"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup")
      .select("doc_id", "is_duplicate").as[(Long, Boolean)].collect().toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true, 5L -> false))
  }

  test("streaming near-dedup finds cross-batch LSH pairs and converges to batch LSH") {
    implicit val sqlCtx = spark.sqlContext
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val aNear = ((1 to 29).map(i => s"w$i") :+ "zzz").mkString(" ")
    val c = (100 to 130).map(i => s"x$i").mkString(" ")
    val input = MemoryStream[Streams.Doc]
    val q = Streams.streamingNearDedup(input.toDS())
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    input.addData(Streams.Doc(1, a), Streams.Doc(2, c))
    q.processAllAvailable()
    // exact dup (4≡1) and near dup (3≈1) arrive in a LATER batch: both
    // pairs only exist through bucket state
    input.addData(Streams.Doc(3, aNear), Streams.Doc(4, a))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.MinhashPortable.minhashLshPortable(
        Seq((1L, a), (2L, c), (3L, aNear), (4L, a)).toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch, s"stream != batch LSH: $streamed vs $batch")
    assert(streamed.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0),
      "cross-batch exact-dup pair (1,4) not discovered")
    assert(!streamed.exists(p => p._2 == 2L || p._1 == 2L),
      "unrelated doc paired")
  }

  test("streaming near-dedup hot-bucket cap bounds state and matches the capped contract") {
    implicit val sqlCtx = spark.sqlContext
    // planted hot bucket: 8 IDENTICAL docs — same signature, so every band
    // lands them in one bucket. cap=3: the bucket retains only the first 3
    // arrivals, so doc b pairs exactly with {a ∈ first 3 : a < b} —
    // 7+6+5 = 18 pairs, not the unbounded 8·7/2 = 28. Retention capped ⇒
    // state ≤ cap signatures per bucket and ≤ cap emissions per arrival.
    val hot = (1 to 30).map(i => s"h$i").mkString(" ")
    val input = MemoryStream[Streams.Doc]
    val q = Streams.streamingNearDedup(input.toDS(), maxBucket = 3)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode(OutputMode.Append()).start()
    // split across batches: the cap must hold through state, not batch-local
    input.addData((1 to 4).map(i => Streams.Doc(i.toLong, hot)): _*)
    q.processAllAvailable()
    input.addData((5 to 8).map(i => Streams.Doc(i.toLong, hot)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup_cap").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val expected = (for { a <- 1L to 3L; b <- (a + 1) to 8L } yield (a, b, 1.0)).toSet
    assert(streamed == expected,
      s"capped stream != capped contract: $streamed vs $expected")
    // and the capped contract is what the registered oracle states: the
    // rank-qualified batch SQL emits the same pair set by construction
    // (rank(a) <= cap in the shared bucket) — pinned here in Scala
    assert(streamed.size == 18 && !streamed.exists(_._1 > 3L),
      "a beyond-cap doc was retained and paired as the earlier side")
  }

  test("reservoir eviction == retain-first == uncapped below the cap; " +
       "reservoir covers tail pairs in a hot bucket") {
    implicit val sqlCtx = spark.sqlContext
    // below the cap the policies are identical by construction
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val aNear = ((1 to 29).map(i => s"w$i") :+ "zzz").mkString(" ")
    val c = (100 to 130).map(i => s"x$i").mkString(" ")
    val small = Seq(Streams.Doc(1, a), Streams.Doc(2, c),
      Streams.Doc(3, aNear), Streams.Doc(4, a))
    val input = MemoryStream[Streams.Doc]
    val q = Streams.streamingNearDedupReservoir(input.toDS())
      .writeStream.format("memory").queryName("neardup_rsv")
      .outputMode(OutputMode.Append()).start()
    input.addData(small: _*); q.processAllAvailable(); q.stop()
    val rsv = spark.table("neardup_rsv").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.MinhashPortable.minhashLshPortable(
        small.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().toSet
    assert(rsv == batch, s"below-cap reservoir != uncapped batch: $rsv vs $batch")

    // hot bucket at cap=3: retain-first NEVER emits a pair with both sides
    // past the head; the reservoir's replace chain retains later arrivals,
    // so some tail×later pair must appear — the coverage-spread contract
    // the ablation measures at 10× (EvictionProbe, SCALING.md)
    val hot = (1 to 30).map(i => s"h$i").mkString(" ")
    val input2 = MemoryStream[Streams.Doc]
    val q2 = Streams.streamingNearDedupReservoir(input2.toDS(), maxBucket = 3)
      .writeStream.format("memory").queryName("neardup_rsv_hot")
      .outputMode(OutputMode.Append()).start()
    input2.addData((1 to 40).map(i => Streams.Doc(i.toLong, hot)): _*)
    q2.processAllAvailable(); q2.stop()
    val rsvHot = spark.table("neardup_rsv_hot").distinct()
      .as[(Long, Long, Double)].collect().toSet
    assert(rsvHot.exists(p => p._1 > 3L),
      s"reservoir never retained a tail doc across 40 arrivals: $rsvHot")
    // state bound still holds: any single arrival pairs with ≤ cap docs,
    // so no doc appears as the LATER side of more than cap pairs
    val perLater = rsvHot.groupBy(_._2).map(_._2.size)
    assert(perLater.forall(_ <= 3), s"an arrival emitted > cap pairs")
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.clickAttributionJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    clicks.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 8, "click", 1.0))
    purchases.addData(
      Event(10, ts(30), 7, "purchase", 5.0),   // 30 min after click 1 → match
      Event(11, ts(30), 9, "purchase", 5.0))   // no click for user 9
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((10L, 1L)))
  }

  test("streaming sessionize closes a session on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    // two events 5 min apart, then a 40-min gap → first session closes
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(5), 7, "click", 1.0),
      Event(3, ts(45), 7, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect()
    assert(rows.toSeq == Seq((7L, 1L, 2L)))
  }

  test("streaming trending terms counts words per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = Streams.trendingTerms(input.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (ts(5), "spark spark join"),
      (ts(20), "join filter"))
    // advance the watermark past hour 0 so the window closes
    input.addData((Timestamp.valueOf("2024-01-01 03:00:00"), "later"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("trending")
      .select("term", "n").as[(String, Long)].collect().toMap
    assert(rows("spark") == 2L && rows("join") == 2L && rows("filter") == 1L)
  }

  test("stream-static join flags spikes against a batch baseline") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = Seq(("click", 2L), ("view", 10L)).toDF("event_type", "med_n")
    val input = MemoryStream[Event]
    val q = Streams.spikesVsBaseline(input.toDF(), baseline)
      .writeStream.format("memory").queryName("spikes")
      .outputMode(OutputMode.Append()).start()
    // 4 clicks (4*2 > 2*3 → spike) and 2 views (2*2 < 10*3 → quiet) in hour 0
    input.addData(
      Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 1, "click", 1.0),
      Event(3, ts(3), 2, "click", 1.0), Event(4, ts(4), 2, "click", 1.0),
      Event(5, ts(5), 3, "view", 1.0), Event(6, ts(6), 3, "view", 1.0))
    input.addData(Event(7, Timestamp.valueOf("2024-01-01 03:00:00"), 9, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("spikes")
      .select("event_type", "n").as[(String, Long)].collect().toSet
    assert(rows.contains(("click", 4L)))
    assert(!rows.exists(_._1 == "view"))
  }

  test("batch curation operators run unchanged on a stream") {
    // batch/stream unification: the SAME declarative Corpus transforms
    // (quality gate + PII scrub) applied to readStream — ingest-time
    // curation needs no separate code path
    implicit val sqlCtx = spark.sqlContext
    case class D(doc_id: Long, text: String)
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val curated = graft.operators.Corpus.piiScrub(stream)
      .join(graft.operators.Corpus.qualityFilter(stream), "doc_id")
    val q = curated.writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (1L, "contact bob@example.com or 5551234 " + Seq.tabulate(12)(i => s"w$i").mkString(" ")),
      (2L, "tiny"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("curated")
      .select("doc_id", "scrubbed", "verdict").as[(Long, String, String)].collect()
      .sortBy(_._1)
    assert(rows(0)._2.contains("<EMAIL>") && rows(0)._2.contains("<NUM>"))
    assert(rows(0)._3 == "keep")
    assert(rows(1)._3 == "too_short")
  }

  test("streaming as-of attributes purchases across batches with O(1) state") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), uid, typ, v)
    val input = MemoryStream[Event]
    val q = Streams.streamingAsof(input.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode(OutputMode.Append()).start()
    // batch 1: a click, a tied-timestamp purchase (at-or-before inclusive,
    // clicks-first ordering), and a purchase with no prior click
    input.addData(
      ev(10, "2024-01-01 09:00:00", 1, "click", 5.0),
      ev(11, "2024-01-01 09:00:00", 1, "purchase", 0.0),
      ev(12, "2024-01-01 08:00:00", 2, "purchase", 0.0))
    q.processAllAvailable()
    // batch 2: idle batch for user 1 (state must persist through it)
    input.addData(ev(20, "2024-01-01 10:00:00", 3, "click", 7.0))
    q.processAllAvailable()
    // batch 3: purchase two batches after its click; a newer click
    // supersedes state before a later purchase in the same batch
    input.addData(
      ev(30, "2024-01-01 11:00:00", 1, "purchase", 0.0),
      ev(31, "2024-01-01 11:30:00", 1, "click", 9.0),
      ev(32, "2024-01-01 12:00:00", 1, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof")
      .select("purchase_id", "click_id", "click_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(rows == Set(
      (11L, 10L, 5.0), // tie: equal-ts click visible to its purchase
      (30L, 10L, 5.0), // state crossed two batch boundaries
      (32L, 31L, 9.0)  // superseded by the newer click
    )) // purchase 12 (no prior click) must not emit
  }

  test("streaming outer as-of emits null attribution immediately for never-clicked purchases") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), uid, typ, v)
    val input = MemoryStream[Event]
    val q = Streams.streamingAsofOuter(input.toDS())
      .writeStream.format("memory").queryName("asof_outer")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      ev(1, "2024-01-01 09:00:00", 1, "purchase", 0.0), // no prior click: null NOW
      ev(2, "2024-01-01 09:30:00", 1, "click", 5.0))
    q.processAllAvailable()
    input.addData(ev(3, "2024-01-01 10:00:00", 1, "purchase", 0.0)) // cross-batch match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof_outer")
      .select("purchase_id", "click_id").as[(Long, Option[Long])].collect().toSet
    assert(rows == Set((1L, None), (3L, Some(2L))))
  }

  test("out-of-order as-of: a late-arriving click still wins; timeout flushes quiet users") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), uid, typ, v)
    val input = MemoryStream[Event]
    val q = Streams.streamingAsofOoo(input.toDS(), watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("asof_ooo")
      .outputMode(OutputMode.Append()).start()
    // batch 1: the purchase arrives BEFORE the click that must attribute it
    input.addData(
      ev(10, "2024-01-01 09:30:00", 1, "purchase", 0.0),
      ev(11, "2024-01-01 08:00:00", 2, "click", 2.0))
    q.processAllAvailable()
    // batch 2: the out-of-order click (earlier ts than purchase 10) lands
    // late; user 2's purchase arrives and user 2 then goes quiet
    input.addData(
      ev(12, "2024-01-01 09:00:00", 1, "click", 7.0),
      ev(13, "2024-01-01 08:30:00", 2, "purchase", 0.0))
    q.processAllAvailable()
    assert(spark.table("asof_ooo").isEmpty,
      "nothing may emit before the watermark passes the purchases")
    // batch 3: far-future event for user 1 only — advances the watermark;
    // user 2 has NO data, so its flush can only come from EventTimeTimeout
    input.addData(ev(14, "2024-01-02 12:00:00", 1, "click", 9.0))
    q.processAllAvailable()
    // one more batch so the new watermark's timeouts fire
    input.addData(ev(15, "2024-01-02 13:00:00", 1, "click", 9.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof_ooo")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(rows == Set(
      (10L, 12L), // attributed to the click that arrived AFTER it
      (13L, 11L)  // flushed by event-time timeout, not by user-2 data
    ), s"got $rows")
  }

  test("out-of-order outer as-of: null attribution waits for the watermark; late click wins") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), uid, typ, v)
    val input = MemoryStream[Event]
    val q = Streams.streamingAsofOooOuter(input.toDS(), watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("asof_ooo_outer")
      .outputMode(OutputMode.Append()).start()
    // purchase 10 arrives BEFORE the click (12) that must attribute it —
    // an eager outer would emit (10, null) here, which is WRONG
    input.addData(
      ev(10, "2024-01-01 09:30:00", 1, "purchase", 0.0),
      ev(13, "2024-01-01 08:30:00", 2, "purchase", 0.0)) // user 2 never clicks
    q.processAllAvailable()
    assert(spark.table("asof_ooo_outer").isEmpty,
      "outer OOO must not decide before the watermark passes the purchase")
    input.addData(ev(12, "2024-01-01 09:00:00", 1, "click", 7.0))
    q.processAllAvailable()
    // advance the watermark past both purchases (plus a batch for timeouts)
    input.addData(ev(14, "2024-01-02 12:00:00", 1, "click", 9.0))
    q.processAllAvailable()
    input.addData(ev(15, "2024-01-02 13:00:00", 1, "click", 9.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof_ooo_outer")
      .select("purchase_id", "click_id").as[(Long, Option[Long])].collect().toSet
    assert(rows == Set(
      (10L, Some(12L)), // the late-arriving click won — not a premature null
      (13L, None)       // never-clicked: null attribution via timeout flush
    ), s"got $rows")
  }

  test("out-of-order as-of: lookback bounds attribution and GCs churned click-only state") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), uid, typ, v)
    val input = MemoryStream[Event]
    val q = Streams.streamingAsofOoo(input.toDS(), watermarkDelay = "2 hours",
        clickLookbackMs = 3600000L) // 1 h attribution window
      .writeStream.format("memory").queryName("asof_ooo_ttl")
      .outputMode(OutputMode.Append()).start()
    // user 1: click 08:00; purchases at 08:30 (inside the 1 h lookback)
    // and 10:00 (outside). user 2: one click, then silence forever.
    input.addData(
      ev(1, "2024-01-01 08:00:00", 1, "click", 5.0),
      ev(2, "2024-01-01 08:00:00", 2, "click", 6.0),
      ev(3, "2024-01-01 08:30:00", 1, "purchase", 0.0))
    q.processAllAvailable()
    // far-future user-1 traffic advances the watermark past user 2's
    // matchable horizon (click 08:00 + 1 h lookback = 09:00)
    input.addData(
      ev(4, "2024-01-01 10:00:00", 1, "purchase", 0.0),
      ev(5, "2024-01-01 18:00:00", 1, "click", 9.0))
    q.processAllAvailable()
    // one more batch so the advanced watermark's timeouts fire (user 2 has
    // no data: its drop can only come from the click-only EventTimeTimeout)
    input.addData(ev(6, "2024-01-01 19:00:00", 1, "click", 9.5))
    q.processAllAvailable()
    val rows = spark.table("asof_ooo_ttl")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((3L, 1L)), // 4 is beyond the lookback: inner drop
      s"lookback must bound attribution, got $rows")
    // churned user 2's click-only cell must be gone; user 1 keeps its live
    // clicks → exactly one state row remains
    var stateRows = -1L
    var waited = 0
    while (waited < 50 && {
      val p = q.lastProgress
      stateRows = if (p == null) -1L
        else p.stateOperators.map(_.numRowsTotal).sum
      stateRows != 1L
    }) { Thread.sleep(100); waited += 1 }
    q.stop()
    assert(stateRows == 1L,
      s"expected user 2's click-only state GC'd (1 row left), got $stateRows")
  }

  test("streaming quantile cells merge across batches and emit on window close") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), 1L, typ, v)
    val input = MemoryStream[Event]
    val q = Streams.streamingQuantileCells(input.toDS().toDF())
      .writeStream.format("memory").queryName("qcells")
      .outputMode(OutputMode.Append()).start()
    // same cell (cents 512..1023 → blen 10, identical top bits for 5.12)
    // hit from TWO different micro-batches: the emitted count must be the
    // MERGED one, which is exactly the "cell counts merge by addition"
    // sketch-union claim stated incrementally
    input.addData(ev(1, "2024-01-30 10:00:00", "click", 5.12))
    q.processAllAvailable()
    input.addData(ev(2, "2024-01-30 11:00:00", "click", 5.12),
      ev(3, "2024-01-30 12:00:00", "click", 300.0))
    q.processAllAvailable()
    assert(spark.table("qcells").isEmpty, "cells must not emit before window close")
    val flush = ev(-1, "2024-01-31 03:00:00", "__flush", 0.0)
    input.addData(flush); q.processAllAvailable()
    input.addData(flush); q.processAllAvailable()
    q.stop()
    val rows = spark.table("qcells")
      .select("event_type", "ck", "c", "mn").as[(String, Long, Long, Double)]
      .collect().toSet
    val clickCells = rows.filter(_._1 == "click")
    assert(clickCells.size == 2, s"expected 2 click cells, got $rows")
    assert(clickCells.exists(c => c._3 == 2L && c._4 == 5.12),
      s"cross-batch cell not merged: $rows")
    assert(clickCells.exists(c => c._3 == 1L && c._4 == 300.0), s"got $rows")
    assert(!rows.exists(_._1 == "__flush"), "flush cells must never emit")
  }

  test("streaming upsert resolves inserts/updates/deletes and flags stale replays") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Upsert]
    val q = Streams.streamingUpsert(input.toDS())
      .writeStream.format("memory").queryName("upsert")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      Streams.Upsert(1L, 10L, "set", "a"),
      Streams.Upsert(1L, 11L, "set", "b"),
      Streams.Upsert(2L, 5L, "delete", ""))
    q.processAllAvailable()
    input.addData(
      Streams.Upsert(1L, 11L, "set", "b"), // replay: stale, no state change
      Streams.Upsert(1L, 12L, "delete", ""),
      Streams.Upsert(2L, 6L, "set", "x"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("upsert")
      .select("key", "seq", "action", "version")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(rows == Set(
      (1L, 10L, "inserted", 1L),
      (1L, 11L, "updated", 2L),
      (2L, 5L, "noop", 0L),
      (1L, 11L, "stale", 2L),
      (1L, 12L, "deleted", 3L),
      (2L, 6L, "inserted", 1L)))
  }
}
