package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Recall, Search}

object Bench {
  /** Machine-load stamp: 1-minute loadavg (from /proc — the JMX bean is the
    * fallback) so a bench number can be read against the contention it ran
    * under. Same commit measured 194 s vs 446 s across two machines in
    * round 4; without a load stamp that difference is unattributable. */
  private def loadAvg(): Double =
    try new String(Files.readAllBytes(Paths.get("/proc/loadavg")),
      StandardCharsets.UTF_8).split("\\s+")(0).toDouble
    catch { case _: Throwable =>
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // per-query repetitions; the reported number is the MEDIAN. One-shot
    // timings at sf0.1 swing 4-11x with machine contention (round-4
    // evidence: identical code, 194 s vs 446 s totals) — the median of 3
    // runs is stable within ~1.5x across consecutive runs, which is what
    // makes round-over-round perf deltas readable as signal.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // test tables are single parquet files; smaller split size restores
      // scan parallelism (at real scale inputs are many files already)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // graft optimizer extensions: textbook-cosine fusion + cosine pre-norm
    // pushdown below joins (bit-exact; CosinePrenormSpec)
    graft.functions.GraftFunctions.registerOptimizerRules(spark)
    // pack_builder's offsets window (≤ numShufflePartitions rows, whitelisted
    // structurally in PlanAuditSpec) triggers WindowExec's "No Partition
    // Defined" warning on every run — benign but it floods the bench log, so
    // silence that one logger rather than re-deriving its benignity per round
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // GraphOps.release intentionally unpersists superseded localCheckpoints;
    // each one logs a WARN ("lineage has been truncated…") that would print
    // thousands of times across the interleaved board
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    def esc(s: String) = s.replaceAll("[\"\\\\\n\r\t]", " ").take(200)
    def f2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // absorb session/filesystem warmup outside the timed region, and run in
    // sorted order so per-query numbers are comparable across rounds
    try graft.sources.Tables.lineitem(spark, sfDir).count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q1,q2 runs a subset (scale-stress runs at sf1 hit
    // only the slowest queries); recall is skipped for subset runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val loadBefore = loadAvg()
    var errors = Map.empty[String, String]
    // every rep of every query is recorded (BENCH_FULL.json "runs") so a
    // suspicious median can be audited; a crashed query must be visible,
    // not a misleadingly fast number: its median is -1 and the message
    // lands in "errors" (remaining reps are skipped — rerunning a crasher
    // only repeats the stack trace).
    //
    // Reps are INTERLEAVED round-robin across queries (r08 verdict item:
    // back-to-back reps let one co-tenant load spike poison ALL reps of a
    // few queries — graph_khop's 2.36/5.41/5.58 s within one run — while
    // interleaving spreads a spike across ONE rep of many queries, which
    // the median then discards), and each rep carries its 1-minute loadavg
    // so a regression diff can gate on the contention it ran under.
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val timesByQ = qlist.map { case (n, _) =>
      n -> scala.collection.mutable.ArrayBuffer.empty[Double] }.toMap
    val loadsByQ = qlist.map { case (n, _) =>
      n -> scala.collection.mutable.ArrayBuffer.empty[Double] }.toMap
    // Stream-replay phase decomposition (r10 verdict item 3): per rep of a
    // stream query, the replay harness records staging / exec / sink
    // seconds; the per-rep EXECUTION series is the cross-round-comparable
    // number, the fixed-cost columns absorb the driver-latency variance.
    val phaseNames = Seq("staging", "exec", "sink")
    val phasesByQ = scala.collection.mutable.Map
      .empty[String, Map[String, scala.collection.mutable.ArrayBuffer[Double]]]
    graft.streaming.StreamReplay.drainTimings() // discard pre-loop leftovers
    for (_ <- 0 until reps; (name, fn) <- qlist if !errors.contains(name)) {
      val l = loadAvg()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timesByQ(name) += (System.nanoTime() - t0) / 1e9
        loadsByQ(name) += l
        val ph = graft.streaming.StreamReplay.drainTimings()
        if (ph.nonEmpty) {
          val m = phasesByQ.getOrElseUpdate(name,
            phaseNames.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap)
          // one entry per rep per phase (a query running several replays
          // per call sums them — the rep's total cost in that phase)
          phaseNames.foreach(p => m(p) += ph.filter(_._1 == p).map(_._2).sum)
        }
      } catch { case e: Throwable =>
        errors += name -> esc(String.valueOf(e.getMessage))
        graft.streaming.StreamReplay.drainTimings() // don't leak into next query
      }
      // Drop leftover storage between queries (r09 verdict item 1a): the
      // iterative graph family localCheckpoints per-round frames whose
      // blocks otherwise accumulate in the single local[32] block manager
      // across all ~218 interleaved queries — the eviction/recompute
      // pressure landed exactly on the checkpoint-heavy family
      // (graph_components 3.6×, label_prop 5.7× in the r09 record). Every
      // rep rebuilds its DataFrame from scratch, so nothing legitimate
      // survives a rep boundary. BLOCKING unpersist: the async form only
      // enqueues removal, so GBs of checkpoint blocks from a graph-family
      // rep would be dropped CONCURRENTLY with the next rep's timed
      // region — paying untimed seconds here keeps the contention out of
      // the medians the interleaved convention exists to protect.
      //
      // INVARIANT (ADVICE r10): this sweep unpersists ALL persistent RDDs,
      // and a release()d/unpersisted localCheckpoint is UNRECOVERABLE
      // (lineage truncated) — so no SparkEntry.queries entry may return a
      // plan that leans on a cached/checkpointed frame surviving a rep
      // boundary. Every registered query today builds its frames from
      // scratch per call (the registry convention); anything stateful
      // (upsert families) re-derives its standing index inside the call.
      try {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        spark.catalog.clearCache()
        // r15 verdict item 6: the per-JVM PQ-model memo survived rep
        // boundaries (reps 2-3 skipped the two model-load collects the
        // sweep exists to make every rep re-pay) — clear it with the rest
        graft.sources.Stores.clearSessionMemos()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    val runs = qlist.map { case (name, _) => name -> timesByQ(name).toSeq }
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0
      else {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
    // a query that crashed after some good reps keeps its partial times in
    // "runs" (auditable) but must NOT publish a median computed from fewer
    // reps next to clean medians-of-N — once a name is in "errors" its
    // median is -1 (ADVICE r09: a reader took partial medians as full-rep
    // results). "rep_counts" records how many reps each query achieved.
    val results = runs.map { case (name, ts) =>
      name -> (if (errors.contains(name)) -1.0 else median(ts)) }
    // recall@k of the approximate ANN indexes vs exact brute force — the
    // accuracy/cost tradeoff tracked per round next to the wall times
    val recalls =
      if (only.isDefined) Map.empty[String, Double]
      else try {
        val emb = graft.sources.Tables.embeddings(spark, sfDir)
        val exact = Search.knnJoin(emb, nProbes = 10, k = 3)
        Map(
          "ann_lsh@3" -> Recall.recallAtK(exact, Dedup.annLsh(emb, nProbes = 10, k = 3)),
          "ann_lsh_mt@3" -> Recall.recallAtK(
            exact, Dedup.annLshMultiTable(emb, nProbes = 10, k = 3)),
          "ann_lsh_mp@3" -> Recall.recallAtK(
            exact, Dedup.annLshMultiprobe(emb, nProbes = 10, k = 3)),
          "ann_ivf@3" -> Recall.recallAtK(exact, Dedup.annIvf(emb, nProbes = 10, k = 3)),
          "ann_graph@3" -> Recall.recallAtK(
            exact, graft.operators.GraphAnn.annGraphSearch(emb, nProbes = 10, k = 3)),
          // maintained-index rungs (r14): search over the upsert-repaired
          // graph vs the same full-corpus exact; the delete rung's recall
          // is vs exact over survivors
          "ann_graph_upsert@3" -> Recall.recallAtK(
            exact, graft.operators.GraphAnn.annGraphUpsert(emb, nProbes = 10, k = 3)),
          "ann_graph_delete@3" -> {
            val embSurv = emb.filter(
              org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.col("vec_id"),
                org.apache.spark.sql.functions.lit(10L)) =!= 0L)
            Recall.recallAtK(Search.knnJoin(embSurv, nProbes = 10, k = 3),
              graft.operators.GraphAnn.annGraphDelete(emb, nProbes = 10, k = 3))
          },
          // sustained-maintenance quality (r15): four alternating
          // upsert/delete cycles vs a from-scratch rebuild of the same
          // final corpus — the number that catches quality decay the
          // lossless-persistence cycle2 gate cannot see
          "ann_graph_cycleN@3" -> {
            val (gM, corpusF) =
              graft.operators.GraphAnn.maintainedGraphCycleN(emb)
            Recall.recallAtK(Search.knnJoin(corpusF, nProbes = 10, k = 3),
              graft.operators.GraphAnn.annGraphSearchFrom(gM, corpusF,
                nProbes = 10, k = 3, releaseGraph = true))
          },
          "ann_graph_rebuildN@3" -> {
            val corpusF = emb.filter(
              org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.col("vec_id"),
                org.apache.spark.sql.functions.lit(40L)) =!= 5L &&
                org.apache.spark.sql.functions.pmod(
                  org.apache.spark.sql.functions.col("vec_id"),
                  org.apache.spark.sql.functions.lit(40L)) =!= 25L)
            Recall.recallAtK(Search.knnJoin(corpusF, nProbes = 10, k = 3),
              graft.operators.GraphAnn.annGraphSearch(corpusF,
                nProbes = 10, k = 3))
          },
          "ann_ivf_mp@3" -> Recall.recallAtK(
            exact, Dedup.annIvfMultiprobe(emb, nProbes = 10, k = 3)),
          "ann_ivf_tr@3" -> Recall.recallAtK(
            exact, graft.operators.Cluster.annIvfTrained(emb, nProbes = 10, k = 3)),
          "ann_pq@3" -> Recall.recallAtK(
            exact, graft.operators.ProductQuant.pqSearch(emb, nProbes = 10, k = 3)),
          "ann_pq_tr@3" -> Recall.recallAtK(
            exact, graft.operators.ProductQuant.pqSearchTrained(emb, nProbes = 10, k = 3)),
          "ann_pq_rerank@3" -> Recall.recallAtK(
            exact, graft.operators.ProductQuant.pqRerank(emb, nProbes = 10, k = 3)),
          "ann_pq_rr_ad@3" -> Recall.recallAtK(
            exact, graft.operators.ProductQuant.pqRerankAdaptive(emb, nProbes = 10, k = 3)),
          "ann_sq8@3" -> Recall.recallAtK(
            exact, graft.operators.ScalarQuant.sq8Search(emb, nProbes = 10, k = 3)),
          "ann_sq8_rr@3" -> Recall.recallAtK(
            exact, graft.operators.ScalarQuant.sq8RerankAdaptive(emb, nProbes = 10, k = 3)),
          "ann_ivf_pq_rr_ad@3" -> Recall.recallAtK(
            exact, graft.operators.ProductQuant.ivfPqRerankAdaptive(emb, nProbes = 10, k = 3)),
          "ann_ivf_pq@3" -> Recall.recallAtK(
            exact, graft.operators.ProductQuant.ivfPqSearch(emb, nProbes = 10, k = 3)),
          "ann_ivf_pq_rr@3" -> Recall.recallAtK(
            exact, graft.operators.ProductQuant.ivfPqRerank(emb, nProbes = 10, k = 3)))
      } catch { case _: Throwable => Map.empty[String, Double] }
    val loadAfter = loadAvg()
    val total = results.map(_._2).filter(_ >= 0).sum
    val rs = recalls.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // Complete per-query table: written to the repo, NOT printed — the
    // driver keeps only the last ~2000 bytes of stdout, which a 100+-entry
    // map overflows (BENCH_r02's line was head-truncated past recovery).
    // "queries" carries the medians; "runs" carries every rep for auditing.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val fullRuns = runs.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(f3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // per-rep 1-minute loadavg, index-aligned with "runs" — the contention
    // context that makes a cross-round per-query diff readable
    val fullLoads = runs.map { case (k, _) =>
      "\"" + k + "\":[" + loadsByQ(k).map(f2).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val repCounts = runs.map { case (k, ts) => "\"" + k + "\":" + ts.size }
      .mkString("{", ",", "}")
    // stream-replay decomposition: per-rep seconds per phase plus the
    // execution median — the number comparable across rounds (staging is
    // paid on the first rep only; sink/checkpoint churn is harness cost)
    val streamPhases = phasesByQ.toSeq.sortBy(_._1).map { case (k, m) =>
      val cols = phaseNames.map(p =>
        "\"" + p + "\":[" + m(p).map(f3).mkString(",") + "]").mkString(",")
      "\"" + k + "\":{" + cols + ",\"exec_median\":" + f3(median(m("exec").toSeq)) + "}"
    }.mkString("{", ",", "}")
    val stamp = s""""reps":$reps,"rep_order":"interleaved","load_1m_before":${f2(loadBefore)},"load_1m_after":${f2(loadAfter)},"machine_cpus":${Runtime.getRuntime.availableProcessors}"""
    val full = s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"cpus":$cpus,$stamp,"queries":$fullQs,"runs":$fullRuns,"rep_loads":$fullLoads,"rep_counts":$repCounts,"stream_phases":$streamPhases,"recall":$rs,"errors":$es,"sf":"$sfDir"}"""
    // subset (scale-stress) runs must not clobber the round's full record;
    // they get their own complete per-query record via SPARK_GRAFT_OUT
    // (stress sweeps need every ratio, not the printed 15-slowest slice)
    val outPath =
      if (only.isEmpty) Some("/root/repo/BENCH_FULL.json")
      else sys.env.get("SPARK_GRAFT_OUT")
    outPath.foreach { p =>
      try Files.write(Paths.get(p), (full + "\n").getBytes(StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    }
    // The printed line carries the COMPLETE per-query median map (r15
    // verdict item 2: the 15-slowest slice left the driver's per-query
    // comparison empty — "parsed: null" — for two rounds; the full map is
    // what PERF's regression/scaling blocks need) plus the actual local[N]
    // core count ("cpus" — machine_cpus reports the HOST's processors even
    // on a low-core run, which invited the cpus-ignored suspicion). Reps,
    // loads and the stream-phase split stay in BENCH_FULL.json.
    val lineQs = results.map { case (k, v) => "\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${f2(total)},"unit":"sec","n_queries":${results.size},"cpus":$cpus,$stamp,"queries":$lineQs,"queries_note":"all ${results.size} medians-of-$reps; per-rep runs in BENCH_FULL.json","recall":$rs,"errors":$es,"sf":"$sfDir"}"""
    println(line)
    // the printed line ALSO lands in a file (r13 verdict item 7: the
    // driver's BENCH_r13 "parsed: null" meant it had to grep the sbt
    // tail) — full-board runs only, so stress subsets can't clobber it
    if (only.isEmpty)
      try Files.write(Paths.get("/root/repo/BENCH_LINE.json"),
        (line + "\n").getBytes(StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    spark.stop()
  }
}
