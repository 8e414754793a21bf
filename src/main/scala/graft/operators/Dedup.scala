package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deduplication operators for LLM-data curation — exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine. All follow the same scale
  * discipline: NEVER an unblocked cross join. Candidate generation is a
  * groupBy on a blocking/bucket key (one shuffle bounded by bucket sizes);
  * pairwise verification happens only inside buckets.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup by content hash: one hash-groupBy shuffle, keep min id.
    * (The classic first pass of every 100 TB dedup pipeline.) */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  val exactSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // ---------- shared shingle machinery ----------

  /** Word-level w-gram shingles (distinct) over `text`. `get` is 0-based and
    * null-safe; concat_ws skips nulls, so tail-short shingles degrade the
    * same way in Spark and DuckDB. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - w, lit(0))),
        i => concat_ws(" ", (0 until w).map(o => get(toks, i + o)): _*)))
  }

  /** DuckDB shingling over a token-list column `t` ([] is 1-based; OOB → NULL,
    * skipped by concat_ws — mirrors the Spark expression above). */
  def shinglesSqlFromToks(t: String, w: Int = 3): String = {
    val parts = (0 until w).map(o => s"$t[i+$o]").mkString(", ")
    s"list_distinct(list_transform(range(1, GREATEST(len($t) - $w, 0) + 2), i -> concat_ws(' ', $parts)))"
  }

  // ---------- n-gram Jaccard ----------

  /** (doc_id, lang, length-bucket, distinct shingle hashes) computed once in
    * the JVM kernel — the shared input for Jaccard and LSH verification.
    * 64-bit hashing shingles keeps later set ops on primitive longs
    * (collision odds at corpus scale ≈ n²/2⁶⁵ — negligible). */
  private def shingleHashes(documents: DataFrame, w: Int, lenBucket: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    spread(documents.select(col("doc_id"), col("lang"), col("n_chars"), col("text")))
      .as[(Long, String, Long, String)]
      .mapPartitions { iter =>
        iter.map { case (docId, lang, nChars, text) =>
          (docId, lang, nChars / lenBucket, shinglesOf(text, w).map(hashShingle).distinct.sorted)
        }
      }
      .toDF("doc_id", "lang", "len_b", "sh")
  }

  /** Near-dup pairs by w-gram Jaccard within (lang, length-bucket) blocks,
    * via an inverted index: explode shingles → equi-join on (block, shingle)
    * → count common shingles per pair → jaccard = c/(|A|+|B|−c). Pairs
    * sharing no shingle never materialize, so cost is driven by true
    * overlap, not block-size² — the shape that survives 100 TB. Blocking by
    * (lang, length) bounds the worst case; near-dups have similar length so
    * recall loss is negligible. */
  def ngramJaccard(documents: DataFrame, w: Int = 3, threshold: Double = 0.5,
                   lenBucket: Int = 50): DataFrame = {
    val sh = shingleHashes(documents, w, lenBucket)
    val ex = sh.select(
      col("lang"), col("len_b"), col("doc_id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("s"))
    ex.as("a").join(ex.as("b"),
        col("a.lang") === col("b.lang") && col("a.len_b") === col("b.len_b") &&
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def ngramJaccardSql(w: Int = 3, threshold: Double = 0.5, lenBucket: Int = 50): String =
    s"""WITH tk AS (
       |  SELECT doc_id, lang, n_chars, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, lang, CAST(n_chars // $lenBucket AS BIGINT) AS len_b,
       |         ${shinglesSqlFromToks("t", w)} AS sh
       |  FROM tk),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
       |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.len_b = b.len_b AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= $threshold""".stripMargin

  /** Dedup RESOLUTION — the step after pair generation that actually
    * shrinks the corpus: cluster the verified near-dup pairs (connected
    * components over the pair graph — only near-dup docs enter it, so the
    * graph is tiny relative to the corpus), elect the canonical survivor
    * per cluster (min doc_id), and emit keep/drop verdicts. Transitive
    * closure matters: A~B and B~C must collapse to ONE survivor even when
    * A and C were never compared. rows-only (iterative clustering is not
    * bounded-depth SQL); spec asserts transitivity and canonical choice. */
  def resolve(documents: DataFrame, w: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = ngramJaccard(documents, w, threshold)
    GraphOps.labelPropagation(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("node").as("doc_id"), col("label").as("canonical_id"),
        (col("node") === col("label")).as("keep"))
  }

  /** DuckDB oracle for resolve: the verified pair graph comes from the
    * oracle-checked ngramJaccard SQL; clustering is plain min-label
    * propagation run past its fixed point (matches any converged
    * algorithm — same argument as GraphOps.componentsSql). Near-dup pair
    * graphs are chains/cliques of a few nodes, so the round budget is
    * generous. */
  def resolveSql(w: Int = 3, threshold: Double = 0.5, rounds: Int = 12): String = {
    val steps = (1 to rounds).map { i =>
      s"""l_$i AS MATERIALIZED (
         |  SELECT l.node, LEAST(l.label, COALESCE(MIN(nl.label), l.label)) AS label
         |  FROM l_${i - 1} l
         |  LEFT JOIN e ON l.node = e.src
         |  LEFT JOIN l_${i - 1} nl ON e.dst = nl.node
         |  GROUP BY l.node, l.label)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS MATERIALIZED (${ngramJaccardSql(w, threshold)}),
       |e AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |l_0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e),
       |$steps
       |SELECT node AS doc_id, label AS canonical_id, node = label AS keep
       |FROM l_$rounds""".stripMargin
  }

  /** Dedup SAVINGS report — what the resolution is worth: per near-dup
    * cluster, member count, dropped count, and the chars (≙ bytes) the
    * drop verdicts reclaim. The numbers every dedup run is judged by
    * before anyone green-lights the rewrite. Joins the (tiny) resolved
    * cluster table back to `documents` for sizes — the corpus-sized side
    * is touched once, semi-join-shaped. */
  def savings(documents: DataFrame, w: Int = 3, threshold: Double = 0.5): DataFrame =
    resolve(documents, w, threshold)
      .join(documents.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("canonical_id"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("keep"), 0L).otherwise(col("n_chars"))).as("chars_saved"))

  def savingsSql(w: Int = 3, threshold: Double = 0.5): String =
    s"""WITH r AS MATERIALIZED (${resolveSql(w, threshold)})
       |SELECT r.canonical_id, COUNT(*) AS n_members,
       |  CAST(SUM(CASE WHEN r.keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN r.keep THEN 0 ELSE d.n_chars END) AS BIGINT) AS chars_saved
       |FROM r JOIN documents d ON r.doc_id = d.doc_id
       |GROUP BY r.canonical_id""".stripMargin

  // ---------- MinHash + LSH ----------

  val MinhashPrime = 1000000007L

  /** Ensure CPU-bound per-row work is spread across cores: a single parquet
    * file reads as one partition locally, serializing the whole operator.
    * At 100 TB inputs arrive in thousands of files so this is a no-op (the
    * gate keeps it from adding a shuffle there). */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** SplitMix64 finalizer — deterministic, fast, public-domain mixer. */
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[operators] def hashShingle(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    splitmix64(h)
  }

  /** Plain-Scala w-gram shingling (the kernel the mapPartitions operators
    * use; semantics match the column-expression `shingles`). */
  private[operators] def shinglesOf(text: String, w: Int = 3): Array[String] = {
    val toks = text.trim.split("\\s+")
    val n = math.max(toks.length - w + 1, 1)
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i < n) {
      out += toks.slice(i, math.min(i + w, toks.length)).mkString(" ")
      i += 1
    }
    out.toArray
  }

  /** Per-doc MinHash signature: nPerms universal-hash minima over shingle
    * hashes — h_i(x) = ((2i+1)·(h(x) mod p) + i²+7) mod p, p = 1e9+7.
    * Computed in a typed mapPartitions: Spark's higher-order functions are
    * CodegenFallback (interpreted per element), which made the expression
    * formulation ~100× slower; the JVM kernel is a narrow, fully
    * distributed pass with identical semantics. */
  def minhashSignature(documents: DataFrame, nPerms: Int = 128): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val p = MinhashPrime
    spread(documents.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.map { case (docId, text) =>
          val hs = shinglesOf(text).map(s => java.lang.Math.floorMod(hashShingle(s), p))
          val sig = new Array[Long](nPerms)
          var i = 0
          while (i < nPerms) {
            var mn = p
            var j = 0
            while (j < hs.length) {
              val v = ((2L * i + 1L) * hs(j) + i.toLong * i + 7L) % p
              if (v < mn) mn = v
              j += 1
            }
            sig(i) = mn
            i += 1
          }
          (docId, sig)
        }
      }
      .toDF("doc_id", "signature")
  }

  /** Harness-facing MinHash view: the raw `array<bigint>` signature is for
    * pipeline use (LSH banding); the driver's comparator needs scalar
    * columns, so the registered query emits a 64-bit digest of the
    * signature instead (order-sensitive, so any signature change shows). */
  def minhashDigest(documents: DataFrame, nPerms: Int = 128): DataFrame =
    minhashSignature(documents, nPerms)
      .select(col("doc_id"), xxhash64(col("signature")).as("sig_digest"))

  /** MinHash-LSH near-dup pairs: signature → bands → bucket groupBy →
    * in-bucket candidate pairs → exact-Jaccard verification. Rows-only
    * (hash family not SQL-portable); the Jaccard verify step reuses the
    * oracle-checked shingle machinery. */
  def minhashLsh(documents: DataFrame, nPerms: Int = 128, bands: Int = 32,
                 threshold: Double = 0.5): DataFrame = {
    // bands must tile the signature exactly: otherwise rowsPerBand floors to
    // 0 and every doc lands in one bucket per band — a quadratic self-join
    require(bands > 0 && nPerms % bands == 0,
      s"bands ($bands) must divide nPerms ($nPerms) exactly")
    val rowsPerBand = nPerms / bands
    val sigs = minhashSignature(documents, nPerms)
    val bandHashes = array((0 until bands).map(b =>
      xxhash64(slice(col("signature"), b * rowsPerBand + 1, rowsPerBand))): _*)
    val banded = sigs.select(col("doc_id"), posexplode(bandHashes))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard over the hashed shingle sets
    // (computed once per doc in the JVM kernel, intersected on longs)
    val sh = shingleHashes(documents, 3, Int.MaxValue).select(col("doc_id"), col("sh"))
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("c").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash from shingle hashes: for each bit k, sum ±1 contributions
    * across shingles; bit k of the fingerprint = (sum > 0). Typed
    * mapPartitions kernel for the same CodegenFallback reason as MinHash. */
  def simhash(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    spread(documents.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.map { case (docId, text) =>
          val counts = new Array[Int](64)
          shinglesOf(text).foreach { s =>
            val h = hashShingle(s)
            var k = 0
            while (k < 64) {
              if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
              k += 1
            }
          }
          var fp = 0L
          var k = 0
          while (k < 64) { if (counts(k) > 0) fp |= (1L << k); k += 1 }
          (docId, fp)
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** SimHash near-dup pairs: 4×16-bit chunk blocking (any pair with hamming
    * ≤ 3 shares at least one exact chunk) → verify via bit_count(xor). */
  def simhashPairs(documents: DataFrame, maxDist: Int = 3): DataFrame = {
    val fps = simhash(documents)
    val chunks = array((0 until 4).map(b =>
      shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = fps.select(col("doc_id"), col("simhash"), posexplode(chunks))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ---------- embedding near-dup ----------

  /** Embedding-cosine near-dup pairs, blocked by cluster label (at 100 TB the
    * label is a coarse quantizer/IVF cell — same plan shape). */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.3): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = embeddings.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  def embeddingNearDupSql(threshold: Double = 0.3): String = {
    val cos = VectorOps.cosineSql("a.embedding", "b.embedding")
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos
       |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $cos >= $threshold""".stripMargin
  }

  // ---------- ANN via random-hyperplane LSH ----------

  /** Deterministic pseudo-random hyperplane component: ((i·2654435761 +
    * j·40503) mod 1021) − 510, reproducible in SQL for the oracle. */
  private def hp(j: Int, i: Column): Column =
    pmod(i * lit(2654435761L) + lit(j.toLong * 40503L), lit(1021L)) - lit(510L)

  private def hpSql(j: Int): String =
    s"(((i*2654435761 + $j*40503) % 1021) - 510)"

  /** LSH bucket id: sign bits of nPlanes hyperplane dots. Planes are
    * literal arrays (same formula as hpSql) dotted via the native codegen
    * kernel — no interpreted HOFs in the bucketing scan. */
  def lshBucket(emb: Column, nPlanes: Int = 4, seed: Int = 0): Column =
    (0 until nPlanes).map { j =>
      val plane = (0 until 64).map(i =>
        (((i.toLong * 2654435761L + (seed + j).toLong * 40503L) % 1021L) - 510L).toDouble)
      val dotJ = VectorOps.dot(emb, typedLit(plane))
      when(dotJ > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(embCol: String, nPlanes: Int = 4, seed: Int = 0): String =
    (0 until nPlanes).map { j =>
      val dotJ = s"list_sum(list_transform(range(0, 64), i -> CAST($embCol[i+1] AS DOUBLE) * CAST(${hpSql(seed + j)} AS DOUBLE)))"
      s"(CASE WHEN $dotJ > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Approximate NN: probes join only their own LSH bucket, then per-probe
    * top-k by exact cosine. At scale: buckets shrink the candidate set by
    * ~2^planes; tune planes to corpus size (recall spec measured 8 planes →
    * 256 buckets over 500 vectors = near-singleton buckets, recall 0.17;
    * 4 planes ≈ 0.5 at 1/16 search cost). Multi-probe (flipping the
    * lowest-margin bits) is the production recall lever. */
  def annLsh(embeddings: DataFrame, nProbes: Int = 10, k: Int = 3,
             probes: Option[DataFrame] = None): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket(col("embedding")))
    val probeDf = Probes.resolve(embeddings, probes, nProbes)
      .withColumn("bucket", lshBucket(col("embedding")))
      .select(col("bucket"), col("vec_id").as("probe_id"), col("embedding").as("pv"))
    bucketed
      .select(col("bucket"), col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probeDf), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  /** IVF-style ANN: a deterministic coarse quantizer (first nCells vectors
    * as centroids — at scale: k-means trained once, broadcast) assigns each
    * vector to its nearest cell; probes search only their own cell. The
    * inverted-file layout every billion-vector index uses: cell assignment
    * is a broadcast argmax (narrow), search cost drops by ~nCells×. */
  def annIvf(embeddings: DataFrame, nCells: Int = 16, nProbes: Int = 10, k: Int = 3,
             probes: Option[DataFrame] = None): DataFrame = {
    // The coarse quantizer is a MODEL PARAMETER — nCells centroid vectors
    // (here: first-n stand-in; Cluster.annIvfTrained passes Lloyd-trained
    // ones). Collecting those nCells rows and inlining them as literals is
    // the IVF contract, and turns cell assignment into a narrow codegen'd
    // projection: the old crossJoin+groupBy(vec_id, embedding) forced an
    // array-keyed SortAggregate (arrays aren't hash-aggregable) plus an
    // extra exchange — all gone.
    import embeddings.sparkSession.implicits._
    val cents: Array[(Long, Array[Float])] = embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    ivfSearch(embeddings, cents, nProbes, k, probes)
  }

  /** Inverted-file search against ANY centroid set: narrow argmax cell
    * assignment (deterministic ties by cell id), probes broadcast, cell-local
    * exact cosine + bounded per-probe top-k. */
  private[operators] def ivfSearch(embeddings: DataFrame, cents: Array[(Long, Array[Float])],
                                   nProbes: Int, k: Int,
                                   probes: Option[DataFrame] = None): DataFrame = {
    val cands = cents.sortBy(_._1).map { case (id, v) =>
      struct(VectorOps.cosine(col("embedding"), typedlit(v)).as("c"),
        lit(-id).as("negid"))
    }
    val cellOf = -greatest(cands.toSeq: _*).getField("negid")
    val assigned = embeddings.select(col("vec_id"), col("embedding"),
      cellOf.as("cell"))
    val probeDf = Probes.resolve(embeddings, probes, nProbes)
      .select(cellOf.as("cell"), col("vec_id").as("probe_id"),
        col("embedding").as("pv"))
    assigned
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probeDf), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  /** Incremental IVF index maintenance — the freshness half of ANN serving
    * (FAISS `add` + the re-train policy every production vector store
    * runs): the indexed corpus (base) keeps its trained quantizer; a new
    * arrival batch (delta — here the deterministic vec_id%10 slice) is
    * assigned to the EXISTING cells with the same narrow broadcast-argmax
    * scan, and the operator emits the per-cell occupancy report: base
    * count, delta count, growth ratio, and a retrain verdict for cells
    * whose delta inflow exceeds `retrainPct`% of their base population
    * (the drift signal that triggers quantizer re-training). Zero new
    * machinery at scale: one narrow assignment pass over the delta + one
    * cell-keyed groupBy of counts. */
  def ivfUpsert(embeddings: DataFrame, nCells: Int = 16, retrainPct: Int = 30): DataFrame = {
    import embeddings.sparkSession.implicits._
    val cents: Array[(Long, Array[Float])] = embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val cands = cents.sortBy(_._1).map { case (id, v) =>
      struct(VectorOps.cosine(col("embedding"), typedlit(v)).as("c"),
        lit(-id).as("negid"))
    }
    val assigned = embeddings.select(col("vec_id"),
      (-greatest(cands.toSeq: _*).getField("negid")).as("cell"),
      (pmod(col("vec_id"), lit(10L)) === 0L).as("is_delta"))
    assigned.groupBy(col("cell"))
      .agg(
        sum(when(col("is_delta"), 0L).otherwise(1L)).as("n_base"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"))
      .withColumn("growth",
        col("n_delta").cast("double") / greatest(col("n_base"), lit(1L)).cast("double"))
      .withColumn("retrain", col("growth") > retrainPct / 100.0)
  }

  /** DELETE direction of IVF index maintenance — completing the family's
    * retract half across all four index types (LSH/BM25/components/IVF;
    * ⇐ graph_service.py:241 delete_node). The standing inverted file is
    * (vec_id, embedding, cell) under a FROZEN quantizer (production: the
    * trained coarse centroids are a model parameter — deletion does NOT
    * retrain them; [[ivfUpsert]]'s drift report is the retrain signal,
    * and it covers shrinkage exactly as it covers growth). Cell
    * assignments are pure per-vector functions of that frozen model, so
    * deletion is exactly lossless: a keyed drop of the departing vec_ids
    * (broadcast anti-join — nothing re-assigned, no surviving vector
    * touched). The registered query serves ANN search FROM the maintained
    * index with the surviving probes; the oracle recomputes cell-local
    * search over the post-delete corpus under the SAME standing quantizer
    * — the hash gate proves the maintained inverted file is exactly the
    * from-scratch one. */
  def ivfDelete(embeddings: DataFrame, nCells: Int = 16, nProbes: Int = 10,
                k: Int = 3): DataFrame = {
    // standing quantizer + inverted file over the full corpus (persisted
    // in production; the quantizer keeps its original training inputs
    // even when those vectors are later deleted — a frozen model)
    val indexFull = ivfIndexFull(embeddings, nCells)
    val delIds = embeddings.filter(pmod(col("vec_id"), lit(10L)) === 0L)
      .select(col("vec_id"))
    ivfDeleteFrom(indexFull, delIds, nProbes, k)
  }

  /** The standing IVF inverted file (vec_id, embedding, cell) under the
    * deterministic frozen quantizer — the artifact an IVF deployment
    * persists (Stores.ivfIndexStore writes it bucketed by cell). One
    * narrow broadcast-argmax pass; centroid collect is nCells rows. */
  private[graft] def ivfIndexFull(embeddings: DataFrame, nCells: Int): DataFrame =
    ivfAssign(embeddings, frozenCents(embeddings, nCells))

  /** The frozen coarse quantizer: the deterministic low-id training
    * vectors, collected once (nCells rows — the bounded model-parameter
    * collect class). Drawn from the FULL corpus relation regardless of
    * which slice is being assigned — the model keeps its training inputs
    * even when those vectors later depart (the ivfDelete contract). */
  private[graft] def frozenCents(embeddings: DataFrame,
                                 nCells: Int): Array[(Long, Array[Float])] = {
    import embeddings.sparkSession.implicits._
    embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
  }

  /** Assign ANY vector slice to its nearest frozen centroid — the narrow
    * broadcast-argmax pass (one codegen'd projection, no join). The unit
    * of IVF maintenance: arrivals are assigned under the frozen model and
    * appended; nothing standing is ever re-assigned. */
  private[graft] def ivfAssign(vectors: DataFrame,
                               cents: Array[(Long, Array[Float])]): DataFrame = {
    val cands = cents.sortBy(_._1).map { case (id, v) =>
      struct(VectorOps.cosine(col("embedding"), typedlit(v)).as("c"),
        lit(-id).as("negid"))
    }
    vectors.select(col("vec_id"), col("embedding"),
      (-greatest(cands.toSeq: _*).getField("negid")).as("cell"))
  }

  /** Pure READ path of the IVF family: serve ANN search FROM the persisted
    * inverted file with zero assignment work. The probe rows (bounded —
    * nProbes, the same bounded-probe-collect class as the centroid model)
    * carry their standing cells; restricting the search scan to those cells
    * as a LITERAL IN on the bucket column makes it a bucket-pruned scan —
    * the per-call full-corpus argmax pass (O(corpus · nCells) flops, the
    * plan you'd never run per query at 100 TB) is gone, and the scan reads
    * ≤ nProbes of nCells buckets. Results are identical to [[annIvf]]: the
    * cell join only ever matches probe cells, so dropping the rest changes
    * nothing, and tie-breaks ride the same TopKAgg. */
  def ivfSearchFromIndex(idx: DataFrame, nProbes: Int = 10, k: Int = 3): DataFrame = {
    val probeCells: Seq[Long] = idx.filter(col("vec_id") < nProbes)
      .select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val probeDf = idx.filter(col("vec_id") < nProbes)
      .select(col("cell"), col("vec_id").as("probe_id"), col("embedding").as("pv"))
    idx.filter(col("cell").isin(probeCells: _*))
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probeDf), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  /** Production-shaped core of [[ivfDelete]]: given the PERSISTED inverted
    * file and the delete list (ids only), drop the departing rows and
    * serve search. Probes are the surviving low-id vectors (a deleted doc
    * does not query); their cells come from their own index rows. */
  def ivfDeleteFrom(indexFull: DataFrame, delIds: DataFrame,
                    nProbes: Int = 10, k: Int = 3): DataFrame = {
    val idx = indexFull.join(delIds, Seq("vec_id"), "left_anti")
    val probeDf = idx.filter(col("vec_id") < nProbes)
      .select(col("cell"), col("vec_id").as("probe_id"), col("embedding").as("pv"))
    idx
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probeDf), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  /** Oracle for [[ivfDelete]]: cell-local search over the post-delete
    * corpus under the SAME standing quantizer (cents from the FULL
    * corpus, including any later-deleted training vectors — the frozen
    * model), with surviving probes. */
  def ivfDeleteSql(nCells: Int = 16, nProbes: Int = 10, k: Int = 3): String =
    ivfSurvivorSearchSql("vec_id % 10 <> 0", nCells, nProbes, k)

  /** Oracle for the two-cycle WRITE-BACK rung (Stores.ivfCycle2Store):
    * cell-local search under the SAME frozen quantizer over the corpus
    * after BOTH maintenance cycles — base (%20 ∉ {0,10}) ⊎ arrivals₁
    * (%20 == 0) ∖ departures₁ (%20 == 5) ⊎ arrivals₂ (%20 == 10) ∖
    * departures₂ (%20 == 15) = every vector with vec_id %20 ∉ {5, 15}.
    * Assignments are pure per-vector functions of the frozen model, so
    * hash-equality proves the persisted inverted file composes losslessly
    * across the write-back boundary. */
  def ivfCycle2Sql(nCells: Int = 16, nProbes: Int = 10, k: Int = 3): String =
    ivfSurvivorSearchSql("vec_id % 20 NOT IN (5, 15)", nCells, nProbes, k)

  /** Oracle for the FOUR-cycle delta-segment rung (Stores.ivfCycle4Store):
    * same frozen-model cell-local search, survivors = everything but the
    * four departure batches (vec_id %40 ∉ {5, 15, 25, 35}). */
  def ivfCycle4Sql(nCells: Int = 16, nProbes: Int = 10, k: Int = 3): String =
    ivfSurvivorSearchSql("vec_id % 40 NOT IN (5, 15, 25, 35)", nCells, nProbes, k)

  private def ivfSurvivorSearchSql(survWhere: String, nCells: Int,
                                   nProbes: Int, k: Int): String = {
    val ccos = VectorOps.cosineSql("e.embedding", "c.embedding")
    val cos = VectorOps.cosineSql("a.embedding", "p.embedding")
    s"""WITH cents AS (SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < $nCells),
       |surv AS (SELECT * FROM embeddings WHERE $survWhere),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, c.cell_id AS cell
       |  FROM surv e CROSS JOIN cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $ccos DESC, c.cell_id) = 1),
       |probes AS (SELECT cell, vec_id AS probe_id, embedding FROM assigned WHERE vec_id < $nProbes)
       |SELECT p.probe_id, a.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY $cos DESC, a.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.probe_id
       |QUALIFY rn <= $k""".stripMargin
  }

  def ivfUpsertSql(nCells: Int = 16, retrainPct: Int = 30): String = {
    val ccos = VectorOps.cosineSql("e.embedding", "c.embedding")
    s"""WITH cents AS (SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < $nCells),
       |assigned AS (
       |  SELECT e.vec_id, c.cell_id AS cell, e.vec_id % 10 = 0 AS is_delta
       |  FROM embeddings e CROSS JOIN cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $ccos DESC, c.cell_id) = 1),
       |occ AS (
       |  SELECT cell,
       |    CAST(SUM(CASE WHEN is_delta THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
       |    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
       |  FROM assigned GROUP BY cell)
       |SELECT cell, n_base, n_delta,
       |  CAST(n_delta AS DOUBLE) / CAST(GREATEST(n_base, 1) AS DOUBLE) AS growth,
       |  CAST(n_delta AS DOUBLE) / CAST(GREATEST(n_base, 1) AS DOUBLE) > ${retrainPct / 100.0}
       |    AS retrain
       |FROM occ""".stripMargin
  }

  /** IVF multi-probe — the recall lever for inverted-file search (FAISS
    * `nprobe`): each probe searches its top-`pCells` nearest cells instead
    * of one. Search cost grows by pCells×; recall loss from cell-boundary
    * effects (true neighbors assigned to the runner-up cell) collapses.
    * Probe side stays broadcast; corpus cells are touched only through
    * cell-equality joins. */
  def annIvfMultiprobe(embeddings: DataFrame, nCells: Int = 16, nProbes: Int = 10,
                       k: Int = 3, pCells: Int = 2,
                       probes: Option[DataFrame] = None): DataFrame = {
    import embeddings.sparkSession.implicits._
    val cents: Array[(Long, Array[Float])] = embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val cands = cents.sortBy(_._1).map { case (id, v) =>
      struct(VectorOps.cosine(col("embedding"), typedlit(v)).as("c"),
        lit(-id).as("negid"))
    }
    // corpus side: argmax cell, as in annIvf
    val assigned = embeddings.select(col("vec_id"), col("embedding"),
      (-greatest(cands.toSeq: _*).getField("negid")).as("cell"))
    // probe side: top-pCells cells via sort_array over the candidate
    // structs (descending cos, then smaller id), sliced and exploded
    val ranked = sort_array(array(cands.toSeq: _*), asc = false)
    val probeDf = Probes.resolve(embeddings, probes, nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        explode(transform(slice(ranked, 1, pCells), s => -s.getField("negid"))).as("cell"))
    assigned
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probeDf), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  def annIvfMultiprobeSql(nCells: Int = 16, nProbes: Int = 10, k: Int = 3,
                          pCells: Int = 2): String = {
    val ccos = VectorOps.cosineSql("e.embedding", "c.embedding")
    val pcos = VectorOps.cosineSql("p0.embedding", "c.embedding")
    val cos = VectorOps.cosineSql("a.embedding", "p.pv")
    s"""WITH cents AS (SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < $nCells),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, c.cell_id AS cell
       |  FROM embeddings e CROSS JOIN cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $ccos DESC, c.cell_id) = 1),
       |probes AS (
       |  SELECT p0.vec_id AS probe_id, p0.embedding AS pv, c.cell_id AS cell
       |  FROM embeddings p0 CROSS JOIN cents c
       |  WHERE p0.vec_id < $nProbes
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY $pcos DESC, c.cell_id) <= $pCells)
       |SELECT p.probe_id, a.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY $cos DESC, a.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.probe_id
       |QUALIFY rn <= $k""".stripMargin
  }

  def annIvfSql(nCells: Int = 16, nProbes: Int = 10, k: Int = 3): String = {
    val ccos = VectorOps.cosineSql("e.embedding", "c.embedding")
    val cos = VectorOps.cosineSql("a.embedding", "p.embedding")
    s"""WITH cents AS (SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < $nCells),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, c.cell_id AS cell
       |  FROM embeddings e CROSS JOIN cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $ccos DESC, c.cell_id) = 1),
       |probes AS (SELECT cell, vec_id AS probe_id, embedding FROM assigned WHERE vec_id < $nProbes)
       |SELECT p.probe_id, a.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY $cos DESC, a.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.probe_id
       |QUALIFY rn <= $k""".stripMargin
  }

  /** Multi-probe LSH — the production recall lever for hyperplane LSH:
    * each probe searches its own bucket PLUS the nPlanes hamming-1
    * neighbor buckets (one sign bit flipped). Search cost grows by
    * (nPlanes+1)×; recall approaches multi-table LSH without storing
    * extra tables (Lv et al., VLDB'07). Probe side stays broadcast; the
    * corpus is still touched only through bucket-equality joins, so the
    * 100 TB shape is unchanged. */
  def annLshMultiprobe(embeddings: DataFrame, nProbes: Int = 10, k: Int = 3,
                       nPlanes: Int = 4, probes: Option[DataFrame] = None): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket(col("embedding"), nPlanes))
    val variants = array(col("bucket") +:
      (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)
    val probeDf = Probes.resolve(embeddings, probes, nProbes)
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        explode(variants).as("bucket"))
    bucketed
      .select(col("bucket"), col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probeDf), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  def annLshMultiprobeSql(nProbes: Int = 10, k: Int = 3, nPlanes: Int = 4): String = {
    val cos = VectorOps.cosineSql("e.embedding", "p.pv")
    val variants = ("p0.bucket" +:
      (0 until nPlanes).map(j => s"xor(p0.bucket, ${1L << j})")).mkString(", ")
    s"""WITH b AS (SELECT vec_id, embedding, ${lshBucketSql("embedding", nPlanes)} AS bucket FROM embeddings),
       |p AS (SELECT p0.vec_id AS probe_id, p0.embedding AS pv,
       |             unnest([$variants]) AS bucket
       |      FROM b p0 WHERE p0.vec_id < $nProbes)
       |SELECT p.probe_id, e.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM b e JOIN p ON e.bucket = p.bucket AND e.vec_id <> p.probe_id
       |QUALIFY rn <= $k""".stripMargin
  }

  def annLshSql(nProbes: Int = 10, k: Int = 3): String = {
    val cos = VectorOps.cosineSql("e.embedding", "p.embedding")
    s"""WITH b AS (SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket FROM embeddings)
       |SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM b e JOIN b p ON e.bucket = p.bucket AND p.vec_id < $nProbes AND e.vec_id <> p.vec_id
       |QUALIFY rn <= $k""".stripMargin
  }

  /** Decorrelated hyperplane family for multi-TABLE LSH. The base family
    * hp(j) is affine in the component index (comp = (i·K + c_j) mod 1021),
    * so any two planes differ by a constant shift — tables built from it
    * are strongly correlated and the multi-table union recalls barely more
    * than one table (measured 0.53 vs the ~0.9 independence predicts). One
    * multiply + xor-shift breaks the affine structure; DuckDB replays it
    * with xor()/integer division. */
  private def hpMt(idx: Long): Double = {
    val v = (idx * 2654435761L) % 4294967296L
    (((v ^ (v / 65536L)) % 1021L) - 510L).toDouble
  }

  private def hpMtSql(planeOff: Int): String =
    s"((xor((i + 64*$planeOff) * 2654435761 % 4294967296, " +
      s"(i + 64*$planeOff) * 2654435761 % 4294967296 // 65536) % 1021) - 510)"

  private def lshBucketMtSql(embCol: String, nPlanes: Int, seed: Int): String =
    (0 until nPlanes).map { j =>
      val dotJ = s"list_sum(list_transform(range(0, 64), i -> CAST($embCol[i+1] AS DOUBLE) * CAST(${hpMtSql(seed + j)} AS DOUBLE)))"
      s"(CASE WHEN $dotJ > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Multi-TABLE LSH (FALCONN-style): L independent hyperplane tables, a
    * candidate is anyone sharing a bucket with the probe in ANY table —
    * recall compounds as 1−(1−p)^L where single-table multiprobe only
    * perturbs one table's bucket. The scale shape: one narrow scan computes
    * all L buckets, explode to (table, bucket) rows, probes broadcast,
    * pairs dedupe through a (probe, neighbor) groupBy BEFORE the bounded
    * top-k (duplicate hits across tables must not occupy top-k slots);
    * search cost is ≤ L× single-table, still bucket-bounded — never
    * all-pairs. Pair dedup keys are scalar ids (arrays never enter a
    * groupBy — SortAggregate trap documented at annIvf).
    *
    * Defaults chosen by measured sweep at sf0.1 (RecallSweep, 2000 vecs):
    * (4 planes, 8 tables) = 0.67 recall@3 touching ~40% of the corpus;
    * (5, 24) = 0.90 touching ~53%. More planes per table sharpens each
    * bucket (the direction that scales — production sizes planes to
    * ~log2(corpus) for near-constant bucket occupancy), more tables buys
    * the 1−(1−p)^L recall compounding; the recall/candidate-cost frontier
    * beat every 4-plane and multiprobe configuration measured. */
  def annLshMultiTable(embeddings: DataFrame, nProbes: Int = 10, k: Int = 3,
                       nPlanes: Int = 5, nTables: Int = 24,
                       probes: Option[DataFrame] = None): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // The plane family (nTables × nPlanes × 64 doubles) is materialized
    // once on the driver and shipped per-executor via
    // sparkContext.broadcast. As inline typedLit expression trees (the
    // previous spelling: 120 DotProductFF nodes each carrying a 64-double
    // literal) the serialized plan rode along with EVERY task binary —
    // the ~1.8 MiB "Broadcasting large task binary" warnings — which at
    // 1000 executors × thousands of tasks is real scheduler/network
    // overhead. The kernel mirrors DotProductFF's strict left-to-right
    // double fold over min-length, so bucket bits (and the DuckDB oracle
    // hash) are unchanged.
    val planes: Array[Array[Array[Double]]] =
      Array.tabulate(nTables, nPlanes, 64)((t, j, i) =>
        hpMt(i.toLong + 64L * (t * nPlanes + j)))
    val bcPlanes = spark.sparkContext.broadcast(planes)
    def bucketize(df: DataFrame): DataFrame = df
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val pl = bcPlanes.value
        iter.flatMap { case (id, v) =>
          Iterator.tabulate(pl.length) { t =>
            var b = 0L
            var j = 0
            while (j < pl(t).length) {
              val p = pl(t)(j)
              val n = math.min(v.length, p.length)
              var dot = 0.0
              var i = 0
              while (i < n) { dot += v(i).toDouble * p(i); i += 1 }
              if (dot > 0) b |= (1L << j)
              j += 1
            }
            (id, v, t, b)
          }
        }
      }
      .toDF("vec_id", "embedding", "tbl", "bucket")
    val tb = bucketize(embeddings)
    val probeDf = bucketize(Probes.resolve(embeddings, probes, nProbes))
      .select(col("tbl"), col("bucket"), col("vec_id").as("probe_id"), col("embedding").as("pv"))
    tb.select(col("tbl"), col("bucket"), col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probeDf), Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      // same pair from several tables scores identically — max() is dedup
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(max(col("cos")).as("cos"))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }

  /** `probeWhere`: replacement for the default first-nProbes probe
    * predicate — the oracle twin of passing an explicit probe frame to
    * [[annLshMultiTable]] (e.g. the split_holdout test split). */
  def annLshMultiTableSql(nProbes: Int = 10, k: Int = 3,
                          nPlanes: Int = 5, nTables: Int = 24,
                          probeWhere: Option[String] = None): String = {
    val cos = VectorOps.cosineSql("e.embedding", "p.embedding")
    val bcols = (0 until nTables)
      .map(t => s"${lshBucketMtSql("embedding", nPlanes, t * nPlanes)} AS b$t")
      .mkString(", ")
    val anyShared = (0 until nTables).map(t => s"e.b$t = p.b$t").mkString(" OR ")
    val probePred = probeWhere.getOrElse(s"p.vec_id < $nProbes")
    s"""WITH b AS MATERIALIZED (SELECT vec_id, embedding, $bcols FROM embeddings)
       |SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM b e JOIN b p ON ($anyShared) AND ($probePred) AND e.vec_id <> p.vec_id
       |QUALIFY rn <= $k""".stripMargin
  }
}
