package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.Tables
import graft.streaming.Streams.{Doc, Event, Upsert}

/** Deterministic replay harness that puts the STREAMING operators into the
  * driver's batch CORRECTNESS loop: each registered `stream_*` query feeds
  * the real Structured-Streaming operator (the same code StreamingSpec
  * exercises) a fixed multi-batch script derived from the test tables —
  * rows sorted on a total order, split into 4 contiguous micro-batches so
  * cross-batch STATE is genuinely exercised — runs it to completion
  * through a memory sink, and returns the final output as a DataFrame the
  * DuckDB oracle can hash. Append-mode windowed operators get a trailing
  * far-future flush event so the watermark closes every real window
  * (per-user flushes for sessionization close every real session); the
  * flush rows themselves never emit, so the output is exactly the batch
  * semantics the oracle states in SQL.
  *
  * This harness is verification plumbing, not a production path — at
  * scale the same operators run on readStream sources with the state
  * store sharded across executors (see Streams.productionStateStoreConf);
  * what the oracle proves is that the incremental, stateful execution
  * converges to the declarative batch answer.
  */
object StreamReplay {

  private val nameCtr = new AtomicLong(0L)
  private val FlushGapMs = 7200000L // 2 h past the last event: closes every window

  /** Per-replay phase decomposition (r10 verdict item 3): the replay's
    * wall time is EXECUTION (stream start → processAllAvailable → stop —
    * the part that measures the operators) plus harness fixed costs —
    * STAGING (batch-file build; cached, so reps past the first pay ~0)
    * and SINK round-trip (parquet sink read-back + localCheckpoint +
    * teardown). The fixed costs are driver-latency-bound and swing
    * ±20–30% with ambient load, which made cross-round stream medians
    * incomparable; recording the phases separately lets the bench publish
    * an execution median the fixed-cost column absorbs the variance of.
    * Entries are (phase, seconds); drained by the bench after each rep. */
  private val timingLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]

  /** Drain and return all phase timings recorded since the last drain. */
  def drainTimings(): Seq[(String, Double)] = {
    val b = Seq.newBuilder[(String, Double)]
    var e = timingLog.poll()
    while (e != null) { b += e; e = timingLog.poll() }
    b.result()
  }

  private def timed[A](phase: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally timingLog.add((phase, (System.nanoTime() - t0) / 1e9))
  }

  /** One checkpoint root shared by every replay, created once and placed on
    * tmpfs when available: the per-replay fixed cost is dominated by the
    * offset/commit/state-file writes of ~5 micro-batches × 4 partitions per
    * query, and a disk-backed java.io.tmpdir pays real fsync/rename latency
    * for state that is discarded seconds later. Each query checkpoints under
    * its own subdirectory (deleted after the replay) so runs never collide.
    * Verification plumbing only — production checkpoints belong on durable
    * storage (see Streams.productionStateStoreConf). */
  private lazy val ckptRoot: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val d = java.nio.file.Files.createTempDirectory(base, "graft-replay-ckpt-")
    // a shutdown hook, NOT File.deleteOnExit: the root still holds the
    // staged-source cache at exit, and deleteOnExit cannot remove a
    // non-empty directory — on tmpfs that would leak RAM-backed files
    // across JVM runs until reboot
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(d) catch { case _: Throwable => () }))
    d
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  /** Single-entry cache of the sorted event script: every event-fed replay
    * re-collected and re-sorted the same table (a fixed per-query driver
    * cost that dwarfed the micro-batch work at bench reps×queries). The
    * script is driver-side by design (bounded replay input); one entry
    * bounds held memory to a single corpus's script. */
  @volatile private var scriptCache: (String, Seq[Event]) = null

  /** Staged-source cache: a replay's batch files are a pure function of
    * (operator, corpus dir) — the bench's 3 reps and any repeated
    * verification replay the identical script, so the parquet staging is
    * done once per key and the source directory reused (tmpfs-resident,
    * a few MB per stream query; cleared with the JVM). */
  private val stagedSrc = scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  /** Feed `batches` through `build`'s streaming query one micro-batch at a
    * time, then snapshot the memory sink. Each batch is staged as ONE
    * parquet file in a per-replay source directory and consumed through a
    * real file `readStream` with `maxFilesPerTrigger = 1` — file order
    * (strictly increasing mtimes, tie-broken by the zero-padded name) IS
    * the deterministic batch sequence. This replaced MemoryStream, whose
    * DSv2 blocks serialize the batch DATA into the consuming task binary:
    * a 25k-event quarter is a ~1.8 MiB task (the bench-tail "very large
    * task" warnings), which is exactly the anti-pattern a real cluster
    * source never exhibits — a file/Kafka source ships data through the
    * scan, not the scheduler. The staging write uses `repartition(1)`
    * (shuffle), NOT `coalesce(1)`, for the same reason: the single writer
    * task pulls rows via shuffle fetch instead of carrying the driver
    * collection in its closure. */
  private def replay[T: Encoder](spark: SparkSession, cacheKey: String,
                                 batches: => Seq[Seq[T]],
                                 build: DataFrame => DataFrame,
                                 label: String = ""): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    // Stateful-operator cost here is dominated by per-(micro-batch ×
    // partition × store-instance) fixed overhead — a stream-stream join
    // commits 4 state stores per partition per batch — while the replay
    // script is bounded and tiny. Scope the state sharding down for the
    // replay (results are partition-count-independent).
    // The session-wide shuffle-partitions conf is mutated for the replay
    // window and restored in `finally`; replays are serialized on this
    // object so two concurrent replays (or a concurrent query planning
    // during the window on a shared getOrCreate session) can't observe or
    // clobber the scoped value. Production sharding guidance is
    // unchanged: see Streams.productionStateStoreConf.
    StreamReplay.synchronized {
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      val replayParts = math.min(prevParts.toInt, 4).toString
      val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prevNoData = spark.conf.get(noDataKey)
      // the label (the registered query key, when the caller shares one
      // staged source across variants) lands in the streaming query name →
      // Spark UI / stack traces / checkpoint dir identify the variant
      val name = s"graft_replay_${if (label.nonEmpty) label + "_" else ""}${nameCtr.incrementAndGet()}"
      // State partitioning is fixed at the query's first micro-batch planning,
      // which happens inside processAllAvailable — keep the conf scoped until
      // the replay completes, then restore.
      spark.conf.set("spark.sql.shuffle.partitions", replayParts)
      // Without this, every data micro-batch that advances the watermark is
      // followed by a NO-DATA batch (state eviction/emission pass) costing
      // the same fixed per-batch overhead — doubling the batch count of a
      // bounded replay. Emission that used to happen in those no-data
      // batches is preserved by the DOUBLED flush batch (same timestamp:
      // the re-sent flush advances nothing, but its batch runs with the
      // watermark the first flush established, emitting every real
      // window; the flush's own window still never closes). Stateful ops
      // here are NoTimeout flatMapGroupsWithState (emission is data-driven)
      // and eager inner stream-stream joins, so no other no-data-batch
      // effect is observable in the final sink.
      spark.conf.set(noDataKey, "false")
      val ckpt = ckptRoot.resolve(name)
      val enc = implicitly[Encoder[T]]
      try {
        val srcDir = timed("staging") { stagedSrc.getOrElseUpdate(cacheKey, {
          val dir = ckptRoot.resolve(name + "_src")
          java.nio.file.Files.createDirectories(dir)
          batches.filter(_.nonEmpty).zipWithIndex.foreach { case (b, i) =>
            val stage = dir.resolve(f"stage$i%03d")
            // explicit slicing bounds the driver rows each staging map task
            // carries: at the default parallelism a 10x-stress quarter is a
            // >2 MiB slice (the same large-task warning this staging path
            // exists to avoid); ~1000 rows/slice keeps every task small
            val slices = math.max(spark.sparkContext.defaultParallelism,
              (b.length + 999) / 1000)
            implicit val ct: scala.reflect.ClassTag[T] =
              scala.reflect.ClassTag.AnyRef.asInstanceOf[scala.reflect.ClassTag[T]]
            spark.createDataset(spark.sparkContext.parallelize(b, slices))(enc)
              .repartition(1).write
              .mode("overwrite").parquet(stage.toString)
            val part = {
              import scala.jdk.CollectionConverters._
              java.nio.file.Files.list(stage).iterator().asScala
                .find(_.getFileName.toString.startsWith("part-"))
                .getOrElse(sys.error(s"no part file staged for batch $i"))
            }
            val dest = dir.resolve(f"b$i%03d.parquet")
            java.nio.file.Files.move(part, dest)
            deleteRecursively(stage)
            // strictly increasing mtimes pin the batch order for the source
            dest.toFile.setLastModified(1000000000000L + i * 60000L)
          }
          dir
        }) }
        val input = spark.readStream.schema(enc.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
        // parquet sink, not the memory sink: memory-sink rows live on the
        // driver and ride the snapshot job's task closures (a stream join's
        // 10x-stress output is a >12 MiB task) — a file sink keeps the
        // output distributed end to end, and the read-back scan ships
        // nothing but file splits. Explicit schema on the read-back keeps
        // the zero-output edge well-defined.
        val outDir = ckptRoot.resolve(name + "_out")
        val built = build(input)
        val outSchema = built.schema
        timed("exec") {
          val q = built.writeStream.format("parquet")
            .option("path", outDir.toString)
            .option("checkpointLocation", ckpt.toString)
            .outputMode(OutputMode.Append()).start()
          try q.processAllAvailable()
          finally q.stop()
        }
        timed("sink") {
          val out = spark.read.schema(outSchema).parquet(outDir.toString)
            .localCheckpoint() // eager: materialized before outDir is deleted
          deleteRecursively(outDir)
          out
        }
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set(noDataKey, prevNoData)
        deleteRecursively(ckpt)
      }
    }
  }

  /** 4 contiguous micro-batches of a pre-sorted script. */
  private def quarters[T](rows: Seq[T]): Seq[Seq[T]] = {
    val n = rows.length
    (0 until 4).map(i => rows.slice(i * n / 4, (i + 1) * n / 4))
  }

  /** Quarters whose boundaries never split a timestamp: each cut advances
    * to the next ts edge, so an operator whose within-batch ordering
    * resolves timestamp ties (streamingAsof's clicks-first rule) sees every
    * tie group whole. Empty tail slices are dropped. */
  private def quartersTsAligned(rows: Seq[Event]): Seq[Seq[Event]] = {
    val n = rows.length
    val cuts = (1 to 3).map { i =>
      var c = i * n / 4
      while (c > 0 && c < n && rows(c).ts.getTime == rows(c - 1).ts.getTime) c += 1
      c
    }
    val bounds = (0 +: cuts :+ n).distinct.sorted
    bounds.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }.toSeq
      .filter(_.nonEmpty)
  }

  /** The event script: the events table on the (ms, event_id) total order
    * the stateful operators sort on. */
  private[graft] def eventScript(spark: SparkSession, dir: String): Seq[Event] = {
    val cached = scriptCache
    if (cached != null && cached._1 == dir) cached._2
    else {
      import spark.implicits._
      val script = Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Event].collect().toSeq
        .sortBy(e => (e.ts.getTime, e.event_id))
      scriptCache = (dir, script)
      script
    }
  }

  // ---- registered stream twins ----

  def streamWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    val flush = Event(-1L, new Timestamp(ev.last.ts.getTime + FlushGapMs), -1L, "__flush", 0.0)
    replay[Event](spark, s"stream_window:$dir", quarters(ev) :+ Seq(flush) :+ Seq(flush), df => Streams.windowAgg(df))
      .select(unix_micros(col("window_start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))
  }

  val streamWindowSql: String =
    """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
      |COUNT(*) AS n,
      |CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Streaming rank-quantile sketch: the [[Streams.streamingQuantileCells]]
    * cell table replayed over day windows, then the bounded batch rank
    * WALK (the kll_portable finishing step, per (window, type)): crossing
    * cell per probe quantile, estimate = its min value. Oracle = the same
    * cells + walk computed from the batch events — the hash gate states
    * "incrementally-maintained sketch == batch recompute". */
  def streamQuantile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    // the flush must put the WATERMARK (flush ts − 2 h delay) past the end
    // of the last event's DAY window — a fixed gap from the last event only
    // closes it when that event happens to fall within the gap of midnight
    // (the hourly-window replays never hit this: their margin exceeds the
    // window size structurally)
    val dayMs = 86400000L
    val lastDayEndMs = (ev.last.ts.getTime / dayMs + 1L) * dayMs
    val flush = Event(-1L, new Timestamp(lastDayEndMs + FlushGapMs + 60000L), -1L, "__flush", 0.0)
    val cells = replay[Event](spark, s"stream_quantile:$dir",
      quarters(ev) :+ Seq(flush) :+ Seq(flush),
      df => Streams.streamingQuantileCells(df))
      // the flush's own window never closes (wm stays 2 h behind it), so
      // this is a no-op guard, not an output shaper
      .filter(col("event_type") =!= "__flush")
    val tot = cells.groupBy(col("window_start"), col("event_type"))
      .agg(sum(col("c")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start", "event_type").orderBy("ck")
    val cum = cells.withColumn("cum", sum(col("c")).over(w))
      .join(tot, Seq("window_start", "event_type"))
    val probes = graft.operators.Kll.Probes.toDF("q", "num", "den")
    val crossing = cum.crossJoin(broadcast(probes))
      .filter(col("cum") * col("den") >= col("num") * col("n"))
      .groupBy(col("window_start"), col("event_type"), col("q"), col("n"))
      .agg(min(col("ck")).as("ck"))
    crossing.join(cells, Seq("window_start", "event_type", "ck"))
      .select(unix_micros(col("window_start")).as("window_start_us"),
        col("event_type"), col("q"), col("n"),
        col("mn").as("est_value"), col("c").as("cell_n"))
  }

  def streamQuantileSql(minorBits: Int = 5): String = {
    val probeRows = graft.operators.Kll.Probes
      .map { case (q, num, den) => s"('$q', ${num}::BIGINT, ${den}::BIGINT)" }
      .mkString(", ")
    val cellW = 1L << (minorBits + 1)
    s"""WITH base AS (
       |  SELECT epoch_us(date_trunc('day', ts)) AS window_start_us, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents, value
       |  FROM events),
       |keyed AS (
       |  SELECT window_start_us, event_type, value,
       |    CAST(length(bin(cents)) AS BIGINT) * $cellW
       |      + (cents >> CAST(greatest(length(bin(cents)) - 1 - $minorBits, 0) AS INTEGER))
       |      AS ck
       |  FROM base),
       |cells AS (
       |  SELECT window_start_us, event_type, ck, COUNT(*) AS c, MIN(value) AS mn
       |  FROM keyed GROUP BY 1, 2, 3),
       |tot AS (SELECT window_start_us, event_type, CAST(SUM(c) AS BIGINT) AS n
       |        FROM cells GROUP BY 1, 2),
       |cum AS (
       |  SELECT cells.*, tot.n,
       |    SUM(c) OVER (PARTITION BY cells.window_start_us, cells.event_type
       |                 ORDER BY ck) AS cum
       |  FROM cells JOIN tot USING (window_start_us, event_type)),
       |probes(q, num, den) AS (VALUES $probeRows),
       |crossing AS (
       |  SELECT window_start_us, event_type, q, n, MIN(ck) AS ck
       |  FROM cum CROSS JOIN probes
       |  WHERE cum * den >= num * n
       |  GROUP BY 1, 2, 3, 4)
       |SELECT cr.window_start_us, cr.event_type, cr.q, cr.n,
       |  ce.mn AS est_value, ce.c AS cell_n
       |FROM crossing cr JOIN cells ce
       |  ON cr.window_start_us = ce.window_start_us
       | AND cr.event_type = ce.event_type AND cr.ck = ce.ck""".stripMargin
  }

  def streamHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    val flush = Event(-1L, new Timestamp(ev.last.ts.getTime + FlushGapMs), -1L, "__flush", 0.0)
    replay[Event](spark, s"stream_histogram:$dir", quarters(ev) :+ Seq(flush) :+ Seq(flush), df => Streams.streamingHistogram(df))
      .select(unix_micros(col("window_start")).as("window_start_us"),
        col("event_type"), col("bucket"), col("n"))
  }

  def streamHistogramSql(nb: Int = 20, vmax: Double = 500.0): String =
    s"""SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
       |LEAST(CAST(FLOOR(value / $vmax * $nb) AS BIGINT), ${nb - 1}) AS bucket,
       |COUNT(*) AS n
       |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** Exact streaming dedup over the documents feed, batched by doc_id
    * quartiles — first arrival (= global min doc_id) wins, later content
    * replays are flagged, including ACROSS batch boundaries (the state
    * path a single-batch run would never touch). */
  /** Shared doc_id-sorted document script for the two stream-dedup
    * replays (exact + near): identical batches, so the staged source is
    * cached once under the `stream_dedup` key. */
  private[graft] def docScript(spark: SparkSession, dir: String): Seq[Doc] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.sortBy(_._1).map { case (id, t) => Doc(id, t) }
  }

  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    replay[Doc](spark, s"stream_dedup:$dir", quarters(docScript(spark, dir)),
      df => Streams.streamingDedup(df.as[Doc]).toDF(), label = "stream_dedup")
      .select(col("doc_id"), col("is_duplicate"))
  }

  /** Streaming minhash-LSH near-dedup replayed over the document feed —
    * bucket state accumulates signatures ACROSS batch boundaries (a pair
    * whose two docs arrive in different quarters only exists via state).
    * Cross-band re-discoveries are exact row duplicates (est is a pure
    * signature function), dropped by one distinct at the sink. The oracle
    * is the BATCH LSH pipeline verbatim (minhashLshPortableSql) — the
    * hash match proves the incremental bucket-state execution converges
    * to the declarative batch answer, the same unification claim the
    * as-of family states. */
  def streamNearDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    replay[Doc](spark, s"stream_dedup:$dir", quarters(docScript(spark, dir)),
      df => Streams.streamingNearDedup(df.as[Doc]).toDF(),
      label = "stream_near_dedup")
      .distinct()
  }

  /** Oracle = the capped-contract batch statement (rank-qualified bucket
    * membership), matching streamingNearDedup's maxBucket=32 default —
    * the gate proves the BOUNDED form's exact contract. */
  val streamNearDedupSql: String =
    graft.operators.MinhashPortable.minhashLshCappedSql(cap = 32)

  /** Store-BOOTSTRAPPED near-dedup — the restart pattern's third instance
    * (after stream_upsert_store / stream_session_store), now over the
    * sharded LSH-index state: the per-bucket retained-signature snapshot
    * after the first two batches is persisted once
    * (Stores.nearDedupStateStore) and the stream starts FROM it via
    * initialState, sketching and processing ONLY the tail batches. Pairs
    * whose later doc arrived in the prefix emitted before the restart and
    * do not re-emit; tail arrivals still pair against prefix docs through
    * the bootstrapped retained sets. Oracle = the capped-contract batch
    * statement restricted to pairs whose LATER doc (the emission trigger)
    * sits in the tail half of the doc_id order. */
  def streamNearDedupStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = quarters(docScript(spark, dir))
    val init = graft.sources.Stores.nearDedupStateStore(spark, dir, qs(0) ++ qs(1))
      .select(col("bucket"), col("doc_id"), col("sig"))
      .as[(String, Long, Array[Long])]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        (k, Streams.BucketState(
          it.toSeq.sortBy(_._2).map(r => Streams.BucketDoc(r._2, r._3))))
      }
    replay[Doc](spark, s"stream_near_dedup_store:$dir", Seq(qs(2), qs(3)),
      df => Streams.streamingNearDedupFrom(df.as[Doc], init).toDF(),
      label = "stream_near_dedup_store")
      .distinct()
  }

  /** Two-cycle WRITE-BACK of the near-dedup bucket state — the LSH-index
    * member of the streaming write-back trio: cycle 1 advances the
    * persisted batch-0/1 retained-signature snapshot through batch 2 FROM
    * the store (batch-2 pairs emitted then — in-stream output, not state)
    * and writes the UPDATED snapshot back
    * (Stores.nearDedupStateStoreCycle2); cycle 2 restarts from it and
    * sketches/streams ONLY batch 3. Oracle = the capped contract
    * restricted to pairs whose trigger doc sits in the last quarter. */
  def streamNearDedupCycle2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = quarters(docScript(spark, dir))
    val init = graft.sources.Stores.nearDedupStateStoreCycle2(spark, dir,
        qs(0) ++ qs(1), qs(2))
      .select(col("bucket"), col("doc_id"), col("sig"))
      .as[(String, Long, Array[Long])]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        (k, Streams.BucketState(
          it.toSeq.sortBy(_._2).map(r => Streams.BucketDoc(r._2, r._3))))
      }
    replay[Doc](spark, s"stream_near_dedup_cycle2:$dir", Seq(qs(3)),
      df => Streams.streamingNearDedupFrom(df.as[Doc], init).toDF(),
      label = "stream_near_dedup_cycle2")
      .distinct()
  }

  /** Oracle for the near-dedup write-back rung: trigger in batch 3. */
  val streamNearDedupCycle2Sql: String = streamNearDedupSqlFrom(3)

  /** Oracle for [[streamNearDedupStore]]: capped contract ∧ trigger-in-tail
    * (doc_b's position in the doc_id total order lands in batches 2–3,
    * with quarters()'s integer-division boundaries). */
  val streamNearDedupStoreSql: String = streamNearDedupSqlFrom(2)

  private def streamNearDedupSqlFrom(minBatch: Int): String =
    s"""WITH capped AS MATERIALIZED (
       |${graft.operators.MinhashPortable.minhashLshCappedSql(cap = 32)}),
       |pos AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn0, n
       |  FROM documents CROSS JOIN (SELECT COUNT(*) AS n FROM documents) t)
       |SELECT c.doc_a, c.doc_b, c.est_jaccard
       |FROM capped c JOIN pos p ON p.doc_id = c.doc_b
       |WHERE p.rn0 >= ($minBatch * p.n) // 4""".stripMargin

  /** Ablation twin (EvictionProbe): the deterministic-reservoir eviction
    * policy run through the same replay — NOT registered (the reservoir's
    * sequential replace chain has no bounded-depth SQL oracle; the
    * ablation is what justifies keeping retain-first registered). */
  def streamNearDedupReservoir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    replay[Doc](spark, s"stream_dedup:$dir", quarters(docScript(spark, dir)),
      df => Streams.streamingNearDedupReservoir(df.as[Doc]).toDF(),
      label = "stream_near_dedup_rsv")
      .distinct()
  }

  /** The oracle groups by TEXT where Spark groups by its 64-bit content
    * hash — they differ only if two distinct texts collide (≈ n²/2⁶⁵, the
    * ngramJaccard precedent). */
  val streamDedupSql: String =
    """SELECT doc_id, doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_duplicate
      |FROM documents""".stripMargin

  /** Streaming sessionization run to completion: one far-future flush per
    * user closes every real session (the flush-opened sessions never
    * emit), so the output is the COMPLETE session log the batch gap-split
    * states in SQL. Millisecond grain on both sides (Timestamp.getTime). */
  def streamSession(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    val flushTs = new Timestamp(ev.last.ts.getTime + FlushGapMs)
    val flushes = ev.map(_.user_id).distinct.sorted.zipWithIndex
      .map { case (u, i) => Event(2000000000L + i, flushTs, u, "__flush", 0.0) }
    replay[Event](spark, s"stream_session:$dir", quarters(ev) :+ flushes,
      df => Streams.sessionize(df.as[Event]).toDF())
  }

  /** Store-BOOTSTRAPPED sessionization — the restart shape generalized
    * from stream_upsert_store to watermark-free session state: the
    * per-user OPEN-session snapshot after the first two batches is
    * persisted once (Stores.sessionStateStore), and the stream starts
    * FROM it, processing only the tail batches + the all-user flush.
    * Sessions the first half already closed (their gap-revealing
    * successor arrived in batches 0–1) emitted then and do NOT re-emit;
    * sessions open at the boundary close either on a tail event or on
    * the flush. Oracle = the batch gap-split filtered to sessions whose
    * closing trigger (the next session's first event, or no successor →
    * the flush) lands in the tail. */
  def streamSessionStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    val qs = quarters(ev)
    val flushTs = new Timestamp(ev.last.ts.getTime + FlushGapMs)
    val flushes = ev.map(_.user_id).distinct.sorted.zipWithIndex
      .map { case (u, i) => Event(2000000000L + i, flushTs, u, "__flush", 0.0) }
    val init = graft.sources.Stores.sessionStateStore(spark, dir, qs(0) ++ qs(1))
      .select(col("user_id").as("_1"), col("session_id").as("_2"),
        col("start_us").as("_3"), col("last_us").as("_4"), col("n").as("_5"))
      .as[(Long, Long, Long, Long, Long)]
    replay[Event](spark, s"stream_session_store:$dir", Seq(qs(2), qs(3), flushes),
      df => Streams.sessionizeFrom(df.as[Event], init).toDF(),
      label = "stream_session_store")
  }

  /** Two-cycle WRITE-BACK of the session state — the watermark-free
    * sibling of [[streamUpsertCycle2]]: cycle 1 advances the persisted
    * batch-0/1 open-session snapshot through batch 2 FROM the store and
    * writes the UPDATED snapshot back (Stores.sessionStateStoreCycle2 —
    * sessions batch 2 closed emitted then and are discarded); cycle 2
    * restarts from the updated snapshot and streams ONLY batch 3 + the
    * all-user flush. Oracle = the batch gap-split filtered to sessions
    * whose closing trigger lands in batch 3 or the flush. */
  def streamSessionCycle2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    val qs = quarters(ev)
    val flushTs = new Timestamp(ev.last.ts.getTime + FlushGapMs)
    val flushes = ev.map(_.user_id).distinct.sorted.zipWithIndex
      .map { case (u, i) => Event(2000000000L + i, flushTs, u, "__flush", 0.0) }
    val init = graft.sources.Stores.sessionStateStoreCycle2(spark, dir,
        qs(0) ++ qs(1), qs(2))
      .select(col("user_id").as("_1"), col("session_id").as("_2"),
        col("start_us").as("_3"), col("last_us").as("_4"), col("n").as("_5"))
      .as[(Long, Long, Long, Long, Long)]
    replay[Event](spark, s"stream_session_cycle2:$dir", Seq(qs(3), flushes),
      df => Streams.sessionizeFrom(df.as[Event], init).toDF(),
      label = "stream_session_cycle2")
  }

  /** Oracle for the session write-back rung: same chain, trigger ≥ 3. */
  def streamSessionCycle2Sql(gapMinutes: Int = 30): String =
    streamSessionSqlFrom(gapMinutes, 3)

  /** Oracle for [[streamSessionStore]]: the same batch gap-split chain,
    * with each event stamped by its quartile batch (the SAME
    * integer-division boundaries quarters() uses, on the (ms, event_id)
    * script order) — a session emits in the tail iff its closing
    * trigger's batch >= 2 (the next session's first event; within a
    * user's ordered rows batches are non-decreasing, so MIN(batch) is
    * the session's first-event batch) or it has no successor (closed by
    * the flush). */
  def streamSessionStoreSql(gapMinutes: Int = 30): String =
    streamSessionSqlFrom(gapMinutes, 2)

  private def streamSessionSqlFrom(gapMinutes: Int, minBatch: Int): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
       |    CASE WHEN rn0 < n // 4 THEN 0
       |         WHEN rn0 < (2 * n) // 4 THEN 1
       |         WHEN rn0 < (3 * n) // 4 THEN 2
       |         ELSE 3 END AS batch
       |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY epoch_ms(ts), event_id) - 1 AS rn0 FROM events)
       |  CROSS JOIN (SELECT COUNT(*) AS n FROM events) t),
       |g AS (
       |  SELECT user_id, ms, event_id, batch,
       |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > ${gapMinutes * 60000L}
       |         THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
       |s AS (
       |  SELECT user_id, ms, event_id, batch,
       |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM g),
       |sess AS (
       |  SELECT user_id, session_id, COUNT(*) AS n_events,
       |    MIN(ms) * 1000 AS start_us, MAX(ms) * 1000 AS end_us,
       |    MIN(batch) AS first_batch
       |  FROM s GROUP BY user_id, session_id),
       |f AS (
       |  SELECT *, LEAD(first_batch) OVER (PARTITION BY user_id ORDER BY session_id) AS trigger_batch
       |  FROM sess)
       |SELECT user_id, session_id, n_events, start_us, end_us
       |FROM f WHERE trigger_batch IS NULL OR trigger_batch >= $minBatch""".stripMargin

  def streamSessionSql(gapMinutes: Int = 30): String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
       |g AS (
       |  SELECT user_id, ms, event_id,
       |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > ${gapMinutes * 60000L}
       |         THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
       |s AS (
       |  SELECT user_id, ms,
       |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM g)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |MIN(ms) * 1000 AS start_us, MAX(ms) * 1000 AS end_us
       |FROM s GROUP BY user_id, session_id""".stripMargin

  /** Streaming CDC upsert over an ops log derived from events (key =
    * user_id, seq = event_id, every 7th op a delete), batched by seq
    * quartiles WITH deterministic replays: each batch re-sends the
    * previous batch's seq%11 ops, which must come back `stale` without
    * mutating state — the idempotent-reprocessing property. */
  def streamUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = quarters(upsertOps(spark, dir))
    val script = (0 until 4).map { i =>
      qs(i) ++ (if (i > 0) qs(i - 1).filter(_.seq % 11 == 0) else Nil)
    }
    replay[Upsert](spark, s"stream_upsert:$dir", script,
      df => Streams.streamingUpsert(df.as[Upsert]).toDF())
  }

  /** The CDC ops log derived from events — shared by the plain and the
    * store-bootstrapped upsert rungs. */
  private[graft] def upsertOps(spark: SparkSession, dir: String): Seq[Upsert] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
      .map { case (eid, uid, etype) =>
        Upsert(uid, eid, if (eid % 7 == 0) "delete" else "upsert", etype)
      }
  }

  /** Store-BOOTSTRAPPED CDC upsert — the production RESTART shape: the
    * per-key state after the first two batches is persisted once
    * (Stores.upsertStateStore, the checkpoint-boundary snapshot a batch
    * job writes), and the stream starts FROM that snapshot via
    * flatMapGroupsWithState's initialState, processing only the tail
    * batches (+ their deterministic stale replays). History is never
    * re-streamed; versions continue from the snapshot; batch-1 re-sends
    * come back `stale` off the bootstrapped lastSeq. Oracle = the full
    * batch chain filtered to the tail batches' rows. */
  def streamUpsertStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = quarters(upsertOps(spark, dir))
    val init = graft.sources.Stores.upsertStateStore(spark, dir, qs(0) ++ qs(1))
      .select(col("key").as("_1"), col("last_seq").as("_2"),
        col("version").as("_3"), col("live").as("_4"))
      .as[(Long, Long, Long, Boolean)]
    val script = Seq(
      qs(2) ++ qs(1).filter(_.seq % 11 == 0),
      qs(3) ++ qs(2).filter(_.seq % 11 == 0))
    replay[Upsert](spark, s"stream_upsert_store:$dir", script,
      df => Streams.streamingUpsertFrom(df.as[Upsert], init).toDF(),
      label = "stream_upsert_store")
  }

  /** Two-cycle WRITE-BACK of the streaming upsert state — the streaming
    * member of the cycle matrix: cycle 1 advances the persisted batch-0/1
    * snapshot through batch 2 FROM the store and writes the UPDATED
    * snapshot back to the catalog (Stores.upsertStateStoreCycle2 — the
    * checkpoint a batch job would publish); cycle 2 restarts the stream
    * from that updated snapshot via initialState and processes ONLY batch
    * 3 (+ its deterministic batch-2 stale replays). Versions continue
    * across BOTH persistence boundaries; oracle = the full batch chain
    * emitting only batch-3 rows. */
  def streamUpsertCycle2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = quarters(upsertOps(spark, dir))
    val snapB = graft.sources.Stores.upsertStateStoreCycle2(spark, dir,
        qs(0) ++ qs(1), qs(2))
      .select(col("key").as("_1"), col("last_seq").as("_2"),
        col("version").as("_3"), col("live").as("_4"))
      .as[(Long, Long, Long, Boolean)]
    val script = Seq(qs(3) ++ qs(2).filter(_.seq % 11 == 0))
    replay[Upsert](spark, s"stream_upsert_cycle2:$dir", script,
      df => Streams.streamingUpsertFrom(df.as[Upsert], snapB).toDF(),
      label = "stream_upsert_cycle2")
  }

  /** Oracle for the write-back rung: the same full chain, batch-3 rows. */
  val streamUpsertCycle2Sql: String = streamUpsertSqlWhere(Some("batch >= 3"))

  val streamUpsertSql: String = streamUpsertSqlWhere(None)

  /** Oracle for the store-bootstrapped rung: the SAME full batch chain —
    * state history included — emitting only the tail batches' rows (the
    * filter sits OUTSIDE the version window, so versions carry the
    * history the snapshot encodes). */
  val streamUpsertStoreSql: String = streamUpsertSqlWhere(Some("batch >= 2"))

  private def streamUpsertSqlWhere(where: Option[String]): String =
    """WITH base AS (
      |  -- batch = which of the 4 contiguous seq-sorted slices the row sits
      |  -- in, with the SAME integer-division boundaries the Scala quarters()
      |  -- uses: slice i covers [i*n//4, (i+1)*n//4)
      |  SELECT user_id AS key, event_id AS seq,
      |    CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op,
      |    event_type AS payload,
      |    CASE WHEN rn0 < n // 4 THEN 0
      |         WHEN rn0 < (2 * n) // 4 THEN 1
      |         WHEN rn0 < (3 * n) // 4 THEN 2
      |         ELSE 3 END AS batch
      |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS rn0 FROM events)
      |  CROSS JOIN (SELECT COUNT(*) AS n FROM events) t),
      |inst AS (
      |  SELECT key, seq, op, payload, batch FROM base
      |  UNION ALL
      |  SELECT key, seq, op, payload, batch + 1 FROM base
      |  WHERE seq % 11 = 0 AND batch <= 2),
      |st AS (
      |  SELECT *, MAX(seq) OVER (PARTITION BY key ORDER BY batch, seq
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM inst),
      |fl AS (
      |  SELECT *, (pmax IS NOT NULL AND seq <= pmax) AS stale FROM st),
      |ns AS (
      |  SELECT *, LAG(op) OVER (PARTITION BY key ORDER BY batch, seq) AS prev_op
      |  FROM fl WHERE NOT stale),
      |act AS (
      |  SELECT key, batch, seq,
      |    CASE WHEN op = 'delete' AND COALESCE(prev_op, 'delete') <> 'delete' THEN 'deleted'
      |         WHEN op = 'delete' THEN 'noop'
      |         WHEN COALESCE(prev_op, 'delete') <> 'delete' THEN 'updated'
      |         ELSE 'inserted' END AS action
      |  FROM ns),
      |acted AS (
      |  SELECT f.key, f.batch, f.seq, f.op, f.payload,
      |    CASE WHEN f.stale THEN 'stale' ELSE a.action END AS action
      |  FROM fl f LEFT JOIN act a ON a.key = f.key AND a.batch = f.batch AND a.seq = f.seq)
      |SELECT key, seq, op, payload, action, version FROM (
      |  SELECT key, batch, seq, op, payload, action,
      |    CAST(SUM(CASE WHEN action IN ('deleted', 'inserted', 'updated') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY key ORDER BY batch, seq
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM acted)
      |""".stripMargin + where.map(w => s"WHERE $w").getOrElse("WHERE TRUE")

  /** Streaming spike detection against the BATCH-computed per-type median
    * hourly baseline (the stream-static join pattern): the static side is
    * the same medians table eventSpikes builds, the stream side is the
    * windowed counts run to completion through the flush. */
  def streamSpike(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ev = eventScript(spark, dir)
    val flush = Event(-1L, new Timestamp(ev.last.ts.getTime + FlushGapMs), -1L, "__flush", 0.0)
    // batch baseline: per-type median of hourly counts (eventSpikes' medians)
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("n"), col("hour"))
    val baseline = hourly
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("n").as("med_n"))
    replay[Event](spark, s"stream_spike:$dir", quarters(ev) :+ Seq(flush) :+ Seq(flush),
      df => Streams.spikesVsBaseline(df, baseline))
      .select(unix_micros(col("window_start")).as("window_start_us"),
        col("event_type"), col("n"), col("med_n"))
  }

  val streamSpikeSql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS window_start_us,
      |         COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, window_start_us) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM hourly),
      |medians AS (
      |  SELECT event_type, n AS med_n FROM ranked WHERE rn = (cnt + 1) // 2)
      |SELECT h.window_start_us, h.event_type, h.n, m.med_n
      |FROM hourly h JOIN medians m ON h.event_type = m.event_type
      |WHERE h.n * 2 > m.med_n * 3""".stripMargin

  /** Watermarked stream-stream interval join run over the deterministic
    * split of the events feed (purchases = event_id % 3 == 0, clicks the
    * rest): inner joins emit eagerly, and because the feed is time-ordered
    * no click is evicted before every purchase that could claim it has
    * arrived — the output is the complete interval join the oracle states. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    replay[Event](spark, s"stream_join:$dir", quarters(ev), { df =>
      val clicks = df.filter(col("event_id") % 3 =!= 0)
      val purchases = df.filter(col("event_id") % 3 === 0)
      Streams.clickAttributionJoin(clicks, purchases)
    })
  }

  val streamJoinSql: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
      |FROM events p JOIN events c
      |  ON p.event_id % 3 = 0 AND c.event_id % 3 <> 0
      | AND c.user_id = p.user_id
      | AND epoch_us(c.ts) <= epoch_us(p.ts)
      | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000""".stripMargin

  /** Streaming as-of attribution: the incremental twin of the batch
    * asof_join_exec operator, replayed over the time-ordered event feed with
    * ts-aligned batch boundaries (a tie group never spans batches, so the
    * clicks-first within-batch order fully resolves at-or-before ties).
    * State is one O(1) cell per user; emission is data-driven, so the
    * 4-batch replay needs no flush — and the oracle is the SAME ASOF JOIN
    * the batch operator verifies against: the stream converges to the
    * batch answer, which is the unification claim stated as a hash. */
  def streamAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    // shared staged-source key with streamAsofOuter — identical
    // ts-aligned script, only the build differs
    replay[Event](spark, s"asof_aligned:$dir", quartersTsAligned(ev),
      df => Streams.streamingAsof(df.as[Event]).toDF(), label = "stream_asof")
  }

  /** Shared builder for the inner as-of attribution oracle: the tolerance
    * variant splices its bound in as a parameter instead of string-appending
    * a WHERE to the finished SQL — textual concatenation silently breaks
    * the moment the base query grows a trailing clause (ADVICE r09; the
    * attributionSql-builder pattern from AsOf.scala). */
  private def asofAttributionSql(extraWhere: Option[String]): String = {
    val where = extraWhere.map(w => s"\nWHERE $w").getOrElse("")
    s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, ts, MAX(event_id) AS click_id,
       |             MAX_BY(value, event_id) AS click_value
       |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
       |SELECT p.event_id AS purchase_id, p.user_id,
       |epoch_ms(p.ts) AS p_ms, epoch_ms(c.ts) AS c_ms, c.click_id, c.click_value
       |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin + where
  }

  val streamAsofSql: String = asofAttributionSql(None)

  /** The one out-of-order replay preamble every OOO as-of variant shares
    * (inner / tolerance / outer — the build function is the only knob, so
    * the three replays and their oracles cannot drift): delivery order is
    * ts + a deterministic ±30 min jitter keyed on event_id, so clicks
    * routinely arrive AFTER the purchases they must attribute — the
    * arrival pattern [[Streams.streamingAsofOoo]]'s watermark/event-time-
    * timeout machinery exists for. The 2 h watermark delay dominates the
    * 30 min disorder with margin, so no row is watermark-late (the
    * operator's retention contract); batches slice the JITTERED order,
    * and the far-future DOUBLED flush advances the watermark so every
    * pending purchase emits (the second flush batch runs WITH the
    * advanced watermark — where quiet users' event-time timeouts fire;
    * ripeness is strict, so a single gap would leave the last-instant
    * purchase pending forever). floorMod: stress-tier event_ids overflow
    * the multiply, and a plain % would widen the jitter range past the
    * watermark's margin. Emitted content is watermark-independent, so
    * each variant's oracle is its batch ASOF SQL. */
  private def jitteredAsofReplay(spark: SparkSession, key: String, dir: String,
                                 build: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    val jittered = ev.sortBy { e =>
      val j = math.floorMod(e.event_id * 2654435761L, 61L) - 30L // ±30 min
      (e.ts.getTime + j * 60000L, e.event_id)
    }
    val flush = Event(-1L, new Timestamp(ev.last.ts.getTime + 2 * FlushGapMs), -1L, "__flush", 0.0)
    // ONE staged-source key for all three OOO variants (inner / tolerance /
    // outer): the script above is variant-independent — only `build`
    // differs — so staging the identical parquet batches three times was
    // pure fixed cost (~1 s per extra variant per bench rep; r09 verdict
    // item 7). `key` names the variant's streaming query (UI/stack traces).
    replay[Event](spark, s"asof_jittered:$dir",
      quarters(jittered) :+ Seq(flush) :+ Seq(flush), build, label = key)
  }

  def streamAsofOoo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jitteredAsofReplay(spark, "stream_asof_ooo", dir,
      df => Streams.streamingAsofOoo(df.as[Event]).toDF())
  }

  val streamAsofOooSql: String = streamAsofSql

  /** Bounded-lookback twin of [[streamAsofOoo]] — the streaming side of
    * `asof_join_tol`: the SAME out-of-order replay, with the 24 h
    * attribution window enforced in the match (Streams.streamingAsofOoo's
    * clickLookbackMs — the bound that also garbage-collects churned
    * click-only state). Content stays watermark-independent, so the
    * oracle is the batch ASOF JOIN with the identical epoch post-filter
    * (equivalent because ASOF holds only the latest at-or-before click —
    * the same argument as the batch tolerance oracle). */
  def streamAsofTol(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jitteredAsofReplay(spark, "stream_asof_tol", dir,
      df => Streams.streamingAsofOoo(df.as[Event],
        clickLookbackMs = graft.operators.AsOf.TolUs / 1000L).toDF())
  }

  val streamAsofTolSql: String = asofAttributionSql(
    Some(s"epoch_ms(p.ts) - epoch_ms(c.ts) <= ${graft.operators.AsOf.TolUs / 1000L}"))

  /** LEFT × out-of-order: the last cell of the as-of matrix — the SAME
    * jittered replay as [[streamAsofOoo]] through
    * [[Streams.streamingAsofOooOuter]], where a purchase's null
    * attribution is only final once the watermark passes it. Oracle = the
    * batch ASOF LEFT JOIN (same as the ordered outer form: emitted
    * content is watermark-independent and the default lookback does not
    * bind on the 30-day corpus). */
  def streamAsofOooOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jitteredAsofReplay(spark, "stream_asof_ooo_outer", dir,
      df => Streams.streamingAsofOooOuter(df.as[Event]).toDF())
  }

  // def: streamAsofOuterSql is declared below (val init order)
  def streamAsofOooOuterSql: String = streamAsofOuterSql

  /** LEFT twin of [[streamAsof]]: never-clicked purchases emit null
    * attributions (final at processing time on a time-ordered feed — see
    * Streams.streamingAsofOuter); oracle = the batch ASOF LEFT JOIN. */
  def streamAsofOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventScript(spark, dir)
    replay[Event](spark, s"asof_aligned:$dir", quartersTsAligned(ev),
      df => Streams.streamingAsofOuter(df.as[Event]).toDF(), label = "stream_asof_outer")
  }

  val streamAsofOuterSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, MAX(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT p.event_id AS purchase_id, p.user_id,
      |epoch_ms(p.ts) AS p_ms, epoch_ms(c.ts) AS c_ms, c.click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** Trending terms over a deterministic timestamped document feed
    * (doc_id minutes past a fixed origin → a few tumbling hours). */
  def streamTrending(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val origin = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
      .map { case (id, t) => (new Timestamp(origin + (id % 180) * 60000L), t, id) }
      .sortBy(r => (r._1.getTime, r._3))
      .map(r => (r._1, r._2))
    val flush = (new Timestamp(origin + 180 * 60000L + FlushGapMs), "__flush")
    replay[(Timestamp, String)](spark, s"stream_trending:$dir", quarters(docs) :+ Seq(flush) :+ Seq(flush),
      df => Streams.trendingTerms(df.toDF("ts", "text")))
      .filter(col("term") =!= "__flush")
      .select(unix_micros(col("window_start")).as("window_start_us"),
        col("term"), col("n"))
  }

  val streamTrendingSql: String =
    """WITH d AS (
      |  SELECT TIMESTAMP '2024-01-01 00:00:00'
      |           + to_milliseconds((doc_id % 180) * 60000) AS ts, text
      |  FROM documents),
      |t AS (
      |  SELECT ts, unnest(string_split_regex(trim(text), '\s+')) AS term FROM d)
      |SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, term, COUNT(*) AS n
      |FROM t GROUP BY 1, 2""".stripMargin
}
