package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Distributed k-means over the embedding column + SemDeDup-style semantic
  * deduplication (near-dup pairs searched only WITHIN a learned cluster —
  * the SemDeDup recipe for pruning web-scale corpora without an all-pairs
  * join).
  *
  * Scale shape (the Lloyd iteration every billion-vector pipeline runs):
  *   - assignment — centroids are a bounded MODEL PARAMETER (k rows),
  *     collected once and inlined as literals, so assignment is a narrow
  *     codegen'd argmax projection over the scan: zero shuffle;
  *   - update — posexplode + groupBy (cell, dim): ONE shuffle of
  *     O(rows·dim) with full map-side partial aggregation down to
  *     k·dim rows.
  * Iterations multiply that by a constant; nothing grows with corpus².
  *
  * Cross-engine determinism (for the DuckDB oracle): centroid components are
  * accumulated as DECIMAL(38,18) over the floats' shortest string reprs —
  * exact and summation-order-independent, where a double sum would drift by
  * partition order — then divided in double and truncated back to float.
  * Ties in the argmax break to the smaller cell id on both engines.
  */
object Cluster {

  /** Narrow argmax-cosine assignment over inlined centroid literals;
    * ties break to the smaller cell id via the negated-id struct field. */
  private def best(cents: Array[(Long, Array[Float])]): Column =
    greatest(cents.sortBy(_._1).map { case (id, v) =>
      struct(VectorOps.cosine(col("embedding"), typedlit(v)).as("c"),
        lit(-id).as("negid"))
    }.toSeq: _*)

  /** Above this cell count, assignment switches from the inlined-literal
    * best() expression to the broadcast-model mapPartitions argmax: the
    * expression spelling inlines k fused cosine kernels per row (and the
    * greatest() tree falls out of whole-stage codegen past ~10² cells —
    * the composed-expression blowup BitLengthLong documented), while the
    * kernel is one tight loop over a broadcast centroid array. */
  private val KernelAssignK = 16

  /** Broadcast-model argmax assignment — the large-k spelling (RagRefresh's
    * kernel). Fold + tie-break are BIT-IDENTICAL to best(): cosineFF is
    * CosineSimFF's sequential double accumulation, Double.compare keeps
    * the first (smaller) cell id on ties — so the trained partition, and
    * every oracle hash, is unchanged by the switch. Emits the embedding
    * through, so pair-join consumers need no join back onto the corpus. */
  private def assignedKernel(embeddings: DataFrame,
                             cents: Array[(Long, Array[Float])]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents.sortBy(_._1))
    embeddings.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cs = bc.value
        iter.map { case (id, v) =>
          var bestId = cs(0)._1
          var bestCos = VectorOps.cosineFF(v, cs(0)._2)
          var ci = 1
          while (ci < cs.length) {
            val c = VectorOps.cosineFF(v, cs(ci)._2)
            if (java.lang.Double.compare(c, bestCos) > 0) { bestCos = c; bestId = cs(ci)._1 }
            ci += 1
          }
          (id, v, bestId, bestCos)
        }
      }.toDF("vec_id", "embedding", "cluster", "cos_to_centroid")
  }

  /** One Lloyd update: per-(cell, dim) exact-decimal mean of the assigned
    * vectors, collected as the next k (bounded) centroid literals. */
  private def updateCentroids(assigned: DataFrame): Array[(Long, Array[Float])] = {
    val comp = assigned
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg(
        sum(col("col").cast("string").cast("decimal(38,18)")).as("s"),
        count(lit(1)).as("n"))
      .select(col("cell"), col("pos"),
        (col("s").cast("double") / col("n").cast("double")).as("comp"))
    comp.collect()
      .groupBy(_.getLong(0))
      .map { case (cell, rows) =>
        (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat))
      }
      .toArray
  }

  /** Deterministic farthest-point seeding (the k-means++/k-means|| quality
    * upgrade over first-k init): start from the minimum vec_id, then
    * repeatedly add the vector farthest from its nearest chosen seed
    * (min cosine to the chosen set; ties to the smaller id). k−1 bounded
    * argmin aggregations, each a narrow scan + 1-row collect — the
    * distributed seeding loop production quantizer training runs. The
    * REGISTERED doc_cluster keeps first-k init so the DuckDB oracle stays
    * non-iterative; this seeding is the `init = "farthest"` path, and the
    * spec measures its cohesion gain. */
  def farthestInit(embeddings: DataFrame, k: Int): Array[(Long, Array[Float])] = {
    import embeddings.sparkSession.implicits._
    val first = embeddings.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].head()
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    while (chosen.length < k) {
      val closeness = chosen.map { case (_, v) =>
        VectorOps.cosine(col("embedding"), typedlit(v))
      }.reduce((a, b) => greatest(a, b))
      val next = embeddings
        .filter(!col("vec_id").isInCollection(chosen.map(_._1)))
        .select(col("vec_id"), col("embedding"), closeness.as("close"))
        .orderBy(col("close"), col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].head()
      chosen += next
    }
    chosen.toArray
  }

  /** The Lloyd training loop alone: returns the trained centroids (the
    * model parameter every quantizer-backed operator broadcasts). */
  private[graft] def trainCentroids(embeddings: DataFrame, k: Int, iters: Int,
                                        init: String = "first"): Array[(Long, Array[Float])] = {
    import embeddings.sparkSession.implicits._
    var cents: Array[(Long, Array[Float])] =
      if (init == "farthest") farthestInit(embeddings, k)
      else embeddings
        .filter(col("vec_id") < k)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    for (_ <- 0 until iters) {
      val assigned =
        if (cents.length > KernelAssignK)
          assignedKernel(embeddings, cents)
            .select(col("vec_id"), col("embedding"), col("cluster").as("cell"))
        else embeddings.select(col("vec_id"), col("embedding"),
          (-best(cents).getField("negid")).as("cell"))
      cents = updateCentroids(assigned)
    }
    cents
  }

  /** k-means (k clusters, `iters` Lloyd updates). init = "first" (first k
    * vectors — deterministic, oracle-replicable) or "farthest"
    * (farthest-point seeding). Returns (vec_id, cluster, cos_to_centroid). */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 1,
             init: String = "first"): DataFrame = {
    val cents = trainCentroids(embeddings, k, iters, init)
    if (cents.length > KernelAssignK)
      assignedKernel(embeddings, cents)
        .select(col("vec_id"), col("cluster"), col("cos_to_centroid"))
    else {
      val b = best(cents)
      embeddings.select(
        col("vec_id"),
        (-b.getField("negid")).as("cluster"),
        b.getField("c").as("cos_to_centroid"))
    }
  }

  /** IVF with a TRAINED coarse quantizer — the production FAISS recipe
    * (`IndexIVF` is always trained; first-k init is only the oracle-friendly
    * stand-in): run `iters` Lloyd updates over the corpus, then inverted-file
    * search against the learned cells. Training cost is the k-means loop
    * (one narrow argmax scan + one map-combined shuffle per iteration);
    * search cost is identical to ann_ivf. Trained cells track the data
    * distribution, so cell sizes — and per-probe search cost — stay balanced
    * where first-k cells can collapse into one hot cell. The DuckDB oracle
    * replays the full Lloyd iteration (decimal-exact sums, proven by
    * doc_cluster) and then the cell-local search, so even this trained index
    * is hash-exact. */
  def annIvfTrained(embeddings: DataFrame, nCells: Int = 16, nProbes: Int = 10,
                    k: Int = 3, iters: Int = 1,
                    probes: Option[org.apache.spark.sql.DataFrame] = None): DataFrame =
    Dedup.ivfSearch(embeddings, trainCentroids(embeddings, nCells, iters), nProbes, k,
      probes)

  def annIvfTrainedSql(nCells: Int = 16, nProbes: Int = 10, k: Int = 3,
                       iters: Int = 1): String = {
    val ccos = VectorOps.cosineSql("e.embedding", "c.embedding")
    val cos = VectorOps.cosineSql("a.embedding", "p.embedding")
    s"""WITH ${centsSql(nCells, iters)},
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, c.cell
       |  FROM embeddings e CROSS JOIN cents_$iters c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $ccos DESC, c.cell) = 1),
       |probes AS (SELECT cell, vec_id AS probe_id, embedding FROM assigned WHERE vec_id < $nProbes)
       |SELECT p.probe_id, a.vec_id AS neighbor_id,
       |CAST(ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY $cos DESC, a.vec_id) AS BIGINT) AS rn,
       |$cos AS cos
       |FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.probe_id
       |QUALIFY rn <= $k""".stripMargin
  }

  /** SemDeDup: cosine near-dup pairs searched only within a k-means cluster
    * — candidate generation is bucket-bounded by the learned partition (the
    * within-cell join is the same inverted-file shape as ann_ivf), never an
    * all-pairs corpus join. */
  def semdedup(embeddings: DataFrame, k: Int = 8, iters: Int = 1,
               threshold: Double = 0.3): DataFrame =
    semdedupPairsFrom(semdedupAssigned(embeddings, k, iters), threshold)

  /** The trained corpus partition (cluster, vec_id, embedding) — semdedup's
    * standing artifact (Stores.semdedupClusters persists it bucketed by
    * cluster, making the within-cluster self-join exchange-free). */
  private[graft] def semdedupAssigned(embeddings: DataFrame, k: Int,
                                      iters: Int): DataFrame =
    assignUnder(embeddings, trainCentroids(embeddings, k, iters))

  /** Assign ANY vector slice under a FROZEN centroid array as
    * (cluster, vec_id, embedding) — the unit of semdedup partition
    * maintenance: arrivals assign in one narrow pass and append; nothing
    * standing is re-assigned. Kernel path carries the embedding through —
    * no join back; small-k expression path keeps the literal-argmax
    * projection. */
  private[graft] def assignUnder(vectors: DataFrame,
                                 cents: Array[(Long, Array[Float])]): DataFrame =
    if (cents.length > KernelAssignK)
      assignedKernel(vectors, cents)
        .select(col("cluster"), col("vec_id"), col("embedding"))
    else {
      val b = best(cents)
      vectors.select(col("vec_id"), (-b.getField("negid")).as("cluster"),
          col("embedding"))
        .select(col("cluster"), col("vec_id"), col("embedding"))
    }

  /** Within-cluster near-dup pair join over an (already) clustered corpus
    * — the serve half of semdedup: a self-join keyed on cluster, so a
    * cluster-bucketed store satisfies both sides' distribution with ZERO
    * exchange. */
  def semdedupPairsFrom(clustered: DataFrame, threshold: Double = 0.3): DataFrame = {
    val a = clustered.select(col("cluster"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = clustered.select(col("cluster"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** The corpus-scaled cluster count of [[semdedupScaled]] — one place so
    * the store build and the inline form can never drift. */
  private[graft] def scaledK(embeddings: DataFrame, targetCell: Int = 64,
                             kMin: Int = 8, kMax: Int = 4096): Int = {
    val n = embeddings.count()
    math.min(kMax, math.max(kMin, math.ceil(n.toDouble / targetCell).toInt))
  }

  /** SemDeDup with the cluster count SCALED TO THE CORPUS instead of fixed:
    * k = clamp(kMin, kMax, ceil(n / targetCell)). The natural-density
    * measurement (SCALING.md r10) showed the candidate bound Σ n_c²/2 is
    * set by CLUSTER COUNT, not by the threshold — fixed k=8 leaves 13.4%
    * of all-pairs inside blocks at every corpus size (so wall time grows
    * quadratically with occupancy), while k matched to n keeps mean cell
    * occupancy ≈ targetCell and the within-cell join linear in n. This is
    * the registered form of that knob. kMax was 64 while assignment
    * inlined k literal expressions (the best() spelling); with the r11
    * broadcast-model kernel the centroid array is just a broadcast
    * (4096·64 floats ≈ 1 MB), so the clamp now binds at 4096 — candidate
    * growth stays LINEAR in n up to n ≈ kMax·targetCell ≈ 262k per
    * partition of the problem, and beyond that the knob to raise is
    * targetCell or a hierarchical quantizer, not an all-pairs fallback.
    * The oracle computes the SAME k via a scalar subquery (its assignment
    * is a CROSS JOIN against the cents CTE — no per-cell inlining), so
    * the trained partition — and the pair set — hash-compares
    * cross-engine. */
  def semdedupScaled(embeddings: DataFrame, targetCell: Int = 64,
                     kMin: Int = 8, kMax: Int = 4096, iters: Int = 1,
                     threshold: Double = 0.3): DataFrame =
    semdedup(embeddings, scaledK(embeddings, targetCell, kMin, kMax), iters, threshold)

  /** UPSERT direction of semdedup maintenance — the daily near-dup loop of
    * a training-data pipeline (SemDeDup rerun over yesterday's corpus +
    * today's crawl): the standing trained partition (base slice,
    * vec_id%10 != 0, quantizer TRAINED ON BASE — frozen before the
    * arrivals exist, the production timeline) takes the arrival batch
    * assigned in one narrow pass, and the operator emits ONLY the pairs
    * the arrivals CREATE — O(Δ · cell occupancy) EMISSION, never a
    * restatement of the standing pair set. Cost honesty: THIS registered
    * inline form still re-trains the base quantizer and re-assigns the
    * base slice in-call (oracle-coverage shape — the gate must see the
    * whole derivation); the O(Δ) COMPUTE claim belongs to
    * [[semdedupUpsertFrom]] / Stores.semdedupUpsertStore, where the
    * frozen model and standing partition come persisted. The oracle re-trains
    * the same base-sliced quantizer, assigns the post-upsert corpus, and
    * restricts the pair join to arrival-touching pairs — hash equality
    * proves the delta emission is exactly the from-scratch difference. */
  def semdedupUpsert(embeddings: DataFrame, targetCell: Int = 64,
                     kMin: Int = 8, kMax: Int = 4096, iters: Int = 1,
                     threshold: Double = 0.3): DataFrame = {
    val isArr = pmod(col("vec_id"), lit(10L)) === 0L
    val base = embeddings.filter(!isArr)
    val cents = trainCentroids(base, scaledK(base, targetCell, kMin, kMax), iters)
    semdedupUpsertFrom(assignUnder(base, cents),
      assignUnder(embeddings.filter(isArr), cents), threshold)
  }

  /** Production-shaped core of [[semdedupUpsert]]: given the PERSISTED
    * standing partition and the (already assigned) arrival rows, emit the
    * created pairs. The two member halves join SEPARATELY and the pair
    * OUTPUTS union — unioning the inputs would discard the standing
    * table's cluster-bucketed distribution and shuffle the index side,
    * the one cost that grows with the corpus instead of the batch. With
    * the O(Δ) arrival side BROADCAST, the standing scan never exchanges
    * (a broadcast hash join in place); the arrival–arrival half is a
    * Δ×Δ self-join kept once via the vec_n < vec_m guard, the
    * arrival–base half regardless of id order (canonicalized by
    * least/greatest — cosine is bit-symmetric on both engines). */
  def semdedupUpsertFrom(standing: DataFrame, arrivals: DataFrame,
                         threshold: Double = 0.3): DataFrame = {
    val arrN = arrivals.select(col("cluster"), col("vec_id").as("vec_n"),
      col("embedding").as("en"))
    val vsBase = standing.select(col("cluster"), col("vec_id").as("vec_m"),
        col("embedding").as("em"))
      .join(broadcast(arrN), Seq("cluster"))
      .filter(col("vec_n") =!= col("vec_m"))
    val vsArr = arrN
      .join(broadcast(arrivals.select(col("cluster"), col("vec_id").as("vec_m"),
        col("embedding").as("em"))), Seq("cluster"))
      .filter(col("vec_n") < col("vec_m"))
    vsBase.select(col("vec_n"), col("vec_m"), col("en"), col("em"))
      .unionByName(vsArr.select(col("vec_n"), col("vec_m"), col("en"), col("em")))
      .withColumn("cos", VectorOps.cosine(col("en"), col("em")))
      .filter(col("cos") >= threshold)
      .select(least(col("vec_n"), col("vec_m")).as("vec_a"),
        greatest(col("vec_n"), col("vec_m")).as("vec_b"), col("cos"))
  }

  /** DELETE direction of semdedup maintenance: a departure batch
    * (vec_id%10 == 0) RETIRES every standing pair it touches — the CDC
    * verdict a downstream dedup-decision consumer needs (the
    * minhash_lsh_delete_retired analog for the embedding family). The
    * quantizer is frozen WITH its training inputs (the ivfDelete
    * contract), so retirement is a scoped within-cell join anchored on
    * the departures — O(Δ · cell occupancy), never O(index). Oracle =
    * the standing pair set of the pre-delete corpus restricted to pairs
    * with a departing side. */
  def semdedupDelete(embeddings: DataFrame, targetCell: Int = 64,
                     kMin: Int = 8, kMax: Int = 4096, iters: Int = 1,
                     threshold: Double = 0.3): DataFrame = {
    val cents = trainCentroids(embeddings,
      scaledK(embeddings, targetCell, kMin, kMax), iters)
    semdedupDeleteFrom(assignUnder(embeddings, cents),
      pmod(col("vec_id"), lit(10L)) === 0L, threshold)
  }

  /** Core of [[semdedupDelete]] over a PERSISTED partition: both join
    * sides read the same (cluster-bucketed) standing table, so the store
    * read path runs exchange-free; `depPred` marks the departing rows. */
  def semdedupDeleteFrom(standing: DataFrame, depPred: Column,
                         threshold: Double = 0.3): DataFrame = {
    val members = standing.select(col("cluster"), col("vec_id").as("vec_m"),
      col("embedding").as("em"), depPred.as("m_dep"))
    standing.filter(depPred)
      .select(col("cluster"), col("vec_id").as("vec_n"), col("embedding").as("en"))
      .join(members, Seq("cluster"))
      .filter(col("vec_n") =!= col("vec_m"))
      .filter(!col("m_dep") || (col("vec_n") < col("vec_m")))
      .withColumn("cos", VectorOps.cosine(col("en"), col("em")))
      .filter(col("cos") >= threshold)
      .select(least(col("vec_n"), col("vec_m")).as("vec_a"),
        greatest(col("vec_n"), col("vec_m")).as("vec_b"), col("cos"))
  }

  /** HIERARCHICAL two-level semdedup quantizer (r13 verdict item 4): the
    * corpus-size ceiling of the flat scaled form is the kMax clamp —
    * beyond n ≈ kMax·targetCell (≈ 262k) cell occupancy grows linearly
    * again and the within-cell join drifts quadratic. Two levels remove
    * it: a COARSE trained partition (k₁ = clamp(ceil(n / (targetCell·fan)))
    * cells of ≈ targetCell·fan vectors) and then, WITHIN each coarse cell,
    * a sub-quantizer of ceil(n_c / targetCell) sub-cells — so occupancy is
    * ≤ ~targetCell at ANY corpus size while capacity multiplies to
    * kMax·fan·targetCell (≈ 16.7M at the defaults; deeper nesting repeats
    * the same step). The sub-level model is NOT a driver-side artifact:
    * sub-centroids live in a DataFrame keyed by cell, assignment is a
    * cell-keyed join + per-vector argmax — per-vector cost is
    * n_c/targetCell ≈ fan comparisons, independent of n, and nothing is
    * collected. Sub-training replays the SAME deterministic recipe as the
    * flat form (first-k init in vec_id order, decimal-exact Lloyd means,
    * ties to the smaller sub id), so the WHOLE two-level train + assign +
    * pair join hash-matches the DuckDB replay. */
  def semdedupHier(embeddings: DataFrame, targetCell: Int = 64, fan: Int = 64,
                   kMin: Int = 8, kMax: Int = 4096, iters: Int = 1,
                   threshold: Double = 0.3): DataFrame =
    semdedupPairsFrom(hierAssigned(embeddings, targetCell, fan, kMin, kMax, iters),
      threshold)

  /** The trained two-level partition as (cluster, vec_id, embedding) with
    * cluster = cell·2³² + sub (cell ≤ kMax < 2¹², sub corpus-bounded —
    * the composite fits BIGINT on both engines). */
  private[graft] def hierAssigned(embeddings: DataFrame, targetCell: Int,
                                  fan: Int, kMin: Int, kMax: Int,
                                  iters: Int): DataFrame = {
    val (_, seeds, coarse) = hierModel(embeddings, targetCell, fan, kMin, kMax, iters)
    assignSub(coarse, seeds)
      .select((col("cell") * lit(4294967296L) + col("sub")).as("cluster"),
        col("vec_id"), col("embedding"))
  }

  /** The frozen TWO-LEVEL quantizer trained on `trainRel`: (coarse
    * centroid array, final sub-centroid DataFrame, materialized coarse
    * assignment of the training corpus). The model artifacts of the
    * hierarchical maintenance rungs — assignment of any slice under them
    * is [[hierAssignUnder]]. */
  private[graft] def hierModel(trainRel: DataFrame, targetCell: Int,
                               fan: Int, kMin: Int, kMax: Int, iters: Int)
      : (Array[(Long, Array[Float])], DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import Iterative._
    // level 1: the flat trained partition at fan× the occupancy target —
    // materialized: consumed by the seed ranking, every sub-Lloyd
    // assignment join, and the final assignment
    val cents = trainCentroids(trainRel,
      scaledK(trainRel, targetCell * fan, kMin, kMax), iters)
    val coarse = assignUnder(trainRel, cents)
      .select(col("cluster").as("cell"), col("vec_id"), col("embedding"))
      .materialize
    // level 2 init: per cell, the first ceil(n_c/targetCell) members in
    // vec_id order (the first-k recipe, cell-locally)
    val ranked = coarse.select(col("cell"), col("vec_id"), col("embedding"),
      row_number().over(Window.partitionBy(col("cell")).orderBy(col("vec_id")))
        .cast("long").as("rn"),
      count(lit(1)).over(Window.partitionBy(col("cell"))).as("n_c"))
    var seeds = ranked
      .filter(col("rn") <=
        ceil(col("n_c").cast("double") / targetCell).cast("long"))
      .select(col("cell"), (col("rn") - 1).as("sub"), col("embedding").as("cv"))
    // level 2 Lloyd steps: cell-keyed join + per-vector argmax, then
    // decimal-exact per-(cell, sub, dim) means (the updateCentroids
    // arithmetic, kept distributed instead of collected)
    for (_ <- 0 until iters) {
      seeds = assignSub(coarse, seeds)
        .select(col("cell"), col("sub"), posexplode(col("embedding")))
        .groupBy(col("cell"), col("sub"), col("pos"))
        .agg(sum(col("col").cast("string").cast("decimal(38,18)")).as("s"),
          count(lit(1)).as("cnt"))
        .select(col("cell"), col("sub"), col("pos"),
          (col("s").cast("double") / col("cnt").cast("double")).cast("float").as("comp"))
        .groupBy(col("cell"), col("sub"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
          x => x.getField("comp")).as("cv"))
    }
    (cents, seeds, coarse)
  }

  /** Assign ANY vector slice under the frozen two-level model as
    * (cluster, vec_id, embedding) — coarse broadcast argmax, then the
    * cell-keyed sub argmax. A slice vector landing in a coarse cell with
    * NO training members has no sub-quantizer and drops out (inner join)
    * — identically on both engines; it seeds the next retrain. */
  private[graft] def hierAssignUnder(vectors: DataFrame,
                                     cents: Array[(Long, Array[Float])],
                                     seeds: DataFrame): DataFrame = {
    val coarse = assignUnder(vectors, cents)
      .select(col("cluster").as("cell"), col("vec_id"), col("embedding"))
    assignSub(coarse, seeds)
      .select((col("cell") * lit(4294967296L) + col("sub")).as("cluster"),
        col("vec_id"), col("embedding"))
  }

  /** UPSERT direction for the HIERARCHICAL quantizer — the scale-path
    * twin of [[semdedupUpsert]]: the two-level model (coarse Lloyd +
    * per-cell sub-Lloyd) is TRAINED ON BASE and frozen; the arrival
    * batch pays one coarse broadcast argmax + one cell-keyed sub argmax,
    * and the rung emits only the created pairs. Oracle = the full
    * two-level replay trained on the base slice, assignment of the
    * post-upsert corpus, arrival-touching pairs. */
  def semdedupHierUpsert(embeddings: DataFrame, targetCell: Int = 64,
                         fan: Int = 64, kMin: Int = 8, kMax: Int = 4096,
                         iters: Int = 1, threshold: Double = 0.3): DataFrame = {
    val isArr = pmod(col("vec_id"), lit(10L)) === 0L
    val (cents, seeds, coarseTrain) =
      hierModel(embeddings.filter(!isArr), targetCell, fan, kMin, kMax, iters)
    val standing = assignSub(coarseTrain, seeds)
      .select((col("cell") * lit(4294967296L) + col("sub")).as("cluster"),
        col("vec_id"), col("embedding"))
    semdedupUpsertFrom(standing,
      hierAssignUnder(embeddings.filter(isArr), cents, seeds), threshold)
  }

  /** DELETE direction for the hierarchical quantizer: retired pairs of
    * the departing batch over the standing two-level partition (model
    * frozen WITH its training inputs). */
  def semdedupHierDelete(embeddings: DataFrame, targetCell: Int = 64,
                         fan: Int = 64, kMin: Int = 8, kMax: Int = 4096,
                         iters: Int = 1, threshold: Double = 0.3): DataFrame =
    semdedupDeleteFrom(
      hierAssigned(embeddings, targetCell, fan, kMin, kMax, iters),
      pmod(col("vec_id"), lit(10L)) === 0L, threshold)

  /** Cell-local argmax-cosine assignment against a sub-centroid DataFrame
    * (ties to the smaller sub id) — the distributed-model counterpart of
    * best()/assignedKernel. */
  private def assignSub(members: DataFrame, seeds: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    members.join(seeds, "cell")
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("cv")))
      .withColumn("rn1", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("sub"))))
      .filter(col("rn1") === 1)
      .select(col("cell"), col("sub"), col("vec_id"), col("embedding"))
  }

  /** Oracle for [[semdedupHier]]: the full two-level replay — coarse
    * train/assign (the flat scaled recipe at fan× occupancy), per-cell
    * first-k sub-init, `iters` decimal-exact sub-Lloyd steps, final
    * assignment, within-(cell, sub) pair join. */
  def semdedupHierSql(targetCell: Int = 64, fan: Int = 64, kMin: Int = 8,
                      kMax: Int = 4096, iters: Int = 1,
                      threshold: Double = 0.3,
                      trainWhere: String = "TRUE",
                      pairWhere: String = "TRUE"): String = {
    // `trainWhere` restricts the TRAINING corpus of BOTH quantizer levels
    // (the frozen-model maintenance oracles train on the base slice);
    // assignment (`clustered`) always covers the full relation, and
    // `pairWhere` restricts the emitted pairs (the delta-emission rungs).
    val kExpr = s"(SELECT LEAST($kMax, GREATEST($kMin, " +
      s"CAST(CEIL(COUNT(*) / ${targetCell.toLong * fan}.0) AS BIGINT))) " +
      s"FROM embeddings WHERE ($trainWhere))"
    val cosC = VectorOps.cosineSql("e.embedding", "c.embedding")
    val cosS = VectorOps.cosineSql("m.embedding", "s.cv")
    val cos = VectorOps.cosineSql("a.embedding", "b.embedding")
    val lloyd = (0 until iters).map { i =>
      s"""sasg_$i AS (
         |  SELECT m.cell, s.sub, m.vec_id, m.embedding
         |  FROM clustered_t m JOIN seeds_$i s ON m.cell = s.cell
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY m.vec_id
         |    ORDER BY $cosS DESC, s.sub) = 1),
         |scomp_$i AS (
         |  SELECT cell, sub, pos,
         |    CAST(SUM(CAST(CAST(val AS VARCHAR) AS DECIMAL(38,18))) AS DOUBLE) AS sm,
         |    COUNT(*) AS cnt
         |  FROM (
         |    SELECT cell, sub,
         |      unnest(range(0, CAST(len(embedding) AS BIGINT))) AS pos,
         |      unnest(embedding) AS val
         |    FROM sasg_$i)
         |  GROUP BY 1, 2, 3),
         |seeds_${i + 1} AS (
         |  SELECT cell, sub, list(CAST(sm / CAST(cnt AS DOUBLE) AS FLOAT) ORDER BY pos) AS cv
         |  FROM scomp_$i GROUP BY cell, sub)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${centsSqlExpr(kExpr, iters, trainWhere)},
       |clustered_t AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, c.cell
       |  FROM (SELECT * FROM embeddings WHERE ($trainWhere)) e CROSS JOIN cents_$iters c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cosC DESC, c.cell) = 1),
       |clustered AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, c.cell
       |  FROM embeddings e CROSS JOIN cents_$iters c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cosC DESC, c.cell) = 1),
       |ranked AS (
       |  SELECT cell, vec_id, embedding,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY cell) AS n_c
       |  FROM clustered_t),
       |seeds_0 AS (
       |  SELECT cell, CAST(rn - 1 AS BIGINT) AS sub, embedding AS cv FROM ranked
       |  WHERE rn <= CAST(CEIL(CAST(n_c AS DOUBLE) / $targetCell) AS BIGINT)),
       |$lloyd,
       |final AS MATERIALIZED (
       |  SELECT m.cell, s.sub, m.vec_id, m.embedding
       |  FROM clustered m JOIN seeds_$iters s ON m.cell = s.cell
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY m.vec_id
       |    ORDER BY $cosS DESC, s.sub) = 1)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos
       |FROM final a JOIN final b
       |  ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
       |WHERE $cos >= $threshold AND ($pairWhere)""".stripMargin
  }

  /** Oracle for [[semdedupHierUpsert]]: both quantizer levels trained on
    * the base slice, post-upsert corpus assigned, arrival-touching pairs. */
  def semdedupHierUpsertSql(targetCell: Int = 64, fan: Int = 64, kMin: Int = 8,
                            kMax: Int = 4096, iters: Int = 1,
                            threshold: Double = 0.3): String =
    semdedupHierSql(targetCell, fan, kMin, kMax, iters, threshold,
      trainWhere = "vec_id % 10 <> 0",
      pairWhere = "a.vec_id % 10 = 0 OR b.vec_id % 10 = 0")

  /** Oracle for [[semdedupHierDelete]]: full-trained frozen two-level
    * model, standing pair set restricted to departure-touching pairs. */
  def semdedupHierDeleteSql(targetCell: Int = 64, fan: Int = 64, kMin: Int = 8,
                            kMax: Int = 4096, iters: Int = 1,
                            threshold: Double = 0.3): String =
    semdedupHierSql(targetCell, fan, kMin, kMax, iters, threshold,
      pairWhere = "a.vec_id % 10 = 0 OR b.vec_id % 10 = 0")

  // ---- DuckDB oracle ----

  private def centsSql(k: Int, iters: Int): String =
    centsSqlExpr(k.toString, iters)

  private def centsSqlExpr(kExpr: String, iters: Int,
                           trainWhere: String = "TRUE"): String = {
    // cents_0 = first-k init; cents_{i+1} = decimal-exact per-dim mean of the
    // argmax-cosine assignment against cents_i (cells losing all members
    // drop out on both engines). kExpr may be a literal or a scalar subquery
    // (the corpus-scaled cluster count). trainWhere restricts the TRAINING
    // corpus (the frozen-model maintenance oracles train on the base slice);
    // both init and every Lloyd step see only the training rows.
    val init = s"cents_0 AS (SELECT vec_id AS cell, embedding FROM embeddings " +
      s"WHERE vec_id < $kExpr AND ($trainWhere))"
    val steps = (0 until iters).map { i =>
      val cos = VectorOps.cosineSql("e.embedding", "c.embedding")
      s"""a_$i AS (
         |  SELECT e.vec_id, e.embedding, c.cell
         |  FROM (SELECT * FROM embeddings WHERE ($trainWhere)) e CROSS JOIN cents_$i c
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.cell) = 1),
         |comp_$i AS (
         |  SELECT cell, pos,
         |    CAST(SUM(CAST(CAST(val AS VARCHAR) AS DECIMAL(38,18))) AS DOUBLE) AS s,
         |    COUNT(*) AS n
         |  FROM (
         |    SELECT cell,
         |      unnest(range(0, CAST(len(embedding) AS BIGINT))) AS pos,
         |      unnest(embedding) AS val
         |    FROM a_$i)
         |  GROUP BY 1, 2),
         |cents_${i + 1} AS (
         |  SELECT cell, list(CAST(s / CAST(n AS DOUBLE) AS FLOAT) ORDER BY pos) AS embedding
         |  FROM comp_$i GROUP BY cell)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  def kmeansSql(k: Int = 8, iters: Int = 1): String = {
    val cos = VectorOps.cosineSql("e.embedding", "c.embedding")
    s"""WITH ${centsSql(k, iters)}
       |SELECT e.vec_id, c.cell AS cluster, $cos AS cos_to_centroid
       |FROM embeddings e CROSS JOIN cents_$iters c
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.cell) = 1""".stripMargin
  }

  def semdedupSql(k: Int = 8, iters: Int = 1, threshold: Double = 0.3): String = {
    val cosC = VectorOps.cosineSql("e.embedding", "c.embedding")
    val cos = VectorOps.cosineSql("a.embedding", "b.embedding")
    s"""WITH ${centsSql(k, iters)},
       |clustered AS (
       |  SELECT e.vec_id, e.embedding, c.cell AS cluster
       |  FROM embeddings e CROSS JOIN cents_$iters c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cosC DESC, c.cell) = 1)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos
       |FROM clustered a JOIN clustered b
       |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE $cos >= $threshold""".stripMargin
  }

  /** Oracle for [[semdedupScaled]]: identical to semdedupSql except the
    * init cell count is the same clamp(ceil(n/targetCell)) formula as a
    * scalar subquery, so both engines train the same k-way partition. */
  def semdedupScaledSql(targetCell: Int = 64, kMin: Int = 8, kMax: Int = 4096,
                        iters: Int = 1, threshold: Double = 0.3): String = {
    val kExpr = s"(SELECT LEAST($kMax, GREATEST($kMin, " +
      s"CAST(CEIL(COUNT(*) / $targetCell.0) AS BIGINT))) FROM embeddings)"
    val cosC = VectorOps.cosineSql("e.embedding", "c.embedding")
    val cos = VectorOps.cosineSql("a.embedding", "b.embedding")
    s"""WITH ${centsSqlExpr(kExpr, iters)},
       |clustered AS (
       |  SELECT e.vec_id, e.embedding, c.cell AS cluster
       |  FROM embeddings e CROSS JOIN cents_$iters c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cosC DESC, c.cell) = 1)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos
       |FROM clustered a JOIN clustered b
       |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE $cos >= $threshold""".stripMargin
  }

  /** Shared oracle for the semdedup MAINTENANCE rungs: quantizer trained
    * over `trainWhere` rows (the frozen model), the `clusteredWhere`
    * corpus assigned under it, pair join restricted by `pairWhere`. */
  private def semdedupMaintSql(targetCell: Int, kMin: Int, kMax: Int,
                               iters: Int, threshold: Double,
                               trainWhere: String, clusteredWhere: String,
                               pairWhere: String): String = {
    val kExpr = s"(SELECT LEAST($kMax, GREATEST($kMin, " +
      s"CAST(CEIL(COUNT(*) / $targetCell.0) AS BIGINT))) FROM embeddings WHERE ($trainWhere))"
    val cosC = VectorOps.cosineSql("e.embedding", "c.embedding")
    val cos = VectorOps.cosineSql("a.embedding", "b.embedding")
    s"""WITH ${centsSqlExpr(kExpr, iters, trainWhere)},
       |clustered AS (
       |  SELECT e.vec_id, e.embedding, c.cell AS cluster
       |  FROM (SELECT * FROM embeddings WHERE ($clusteredWhere)) e CROSS JOIN cents_$iters c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cosC DESC, c.cell) = 1)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos
       |FROM clustered a JOIN clustered b
       |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE $cos >= $threshold AND ($pairWhere)""".stripMargin
  }

  /** Oracle for [[semdedupUpsert]]: base-trained frozen quantizer,
    * post-upsert corpus assigned, arrival-touching pairs only. */
  def semdedupUpsertSql(targetCell: Int = 64, kMin: Int = 8, kMax: Int = 4096,
                        iters: Int = 1, threshold: Double = 0.3): String =
    semdedupMaintSql(targetCell, kMin, kMax, iters, threshold,
      "vec_id % 10 <> 0", "TRUE",
      "a.vec_id % 10 = 0 OR b.vec_id % 10 = 0")

  /** Oracle for [[semdedupDelete]]: full-trained frozen quantizer, standing
    * (pre-delete) pair set restricted to departure-touching pairs. */
  def semdedupDeleteSql(targetCell: Int = 64, kMin: Int = 8, kMax: Int = 4096,
                        iters: Int = 1, threshold: Double = 0.3): String =
    semdedupMaintSql(targetCell, kMin, kMax, iters, threshold,
      "TRUE", "TRUE", "a.vec_id % 10 = 0 OR b.vec_id % 10 = 0")

  /** Oracle for the semdedup write-back cycle (Stores.semdedupCycle2Store):
    * the within-cluster pair set of the post-both-batches corpus
    * (survivors vec_id %20 ∉ {5, 15}) under the quantizer frozen with its
    * training inputs. */
  def semdedupCycle2Sql(targetCell: Int = 64, kMin: Int = 8, kMax: Int = 4096,
                        iters: Int = 1, threshold: Double = 0.3): String =
    semdedupMaintSql(targetCell, kMin, kMax, iters, threshold,
      "TRUE", "vec_id % 20 NOT IN (5, 15)", "TRUE")

  /** Cluster topic labeling — the "what IS cluster 7" step after any
    * clustering run: per label, the top-N distinguishing terms by TF-IDF
    * (rational log-free idf, the tfidf precedent — no libm at query time).
    * Docs pair to their cluster by doc_id = vec_id; the tf rollup is one
    * map-combined shuffle keyed by (label, term), the df table is
    * O(vocab), and the final top-N window partitions by label — never
    * global. */
  def topicTerms(documents: DataFrame, embeddings: DataFrame, topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = documents.select(col("doc_id"), col("text"))
      .join(embeddings.select(col("vec_id").as("doc_id"), col("label")), "doc_id")
    val terms = labeled
      .select(col("label"), explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = terms.groupBy(col("label"), col("term")).agg(count(lit(1)).as("tf"))
    val nLabels = embeddings.select(countDistinct(col("label")).as("n_labels"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(nLabels))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n_labels").cast("double") - col("df").cast("double") + 0.5) /
            (col("df").cast("double") + 0.5)))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("score").desc, col("term"))))
      .filter(col("rn") <= topN)
      .select(col("label"), col("rn").cast("long").as("rn"), col("term"),
        col("tf"), col("score"))
  }

  def topicTermsSql(topN: Int = 5): String =
    s"""WITH labeled AS (
       |  SELECT e.label, d.text FROM documents d
       |  JOIN embeddings e ON e.vec_id = d.doc_id),
       |terms AS (
       |  SELECT label, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM labeled),
       |tf AS (
       |  SELECT label, term, COUNT(*) AS tf FROM terms GROUP BY label, term),
       |df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |nl AS (SELECT COUNT(DISTINCT label) AS n_labels FROM embeddings),
       |scored AS (
       |  SELECT tf.label, tf.term, tf.tf,
       |    CAST(tf.tf AS DOUBLE) *
       |      ((CAST(nl.n_labels AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
       |       (CAST(df.df AS DOUBLE) + 0.5)) AS score
       |  FROM tf JOIN df ON df.term = tf.term CROSS JOIN nl)
       |SELECT label,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY score DESC, term) AS BIGINT) AS rn,
       |  term, tf, score
       |FROM scored QUALIFY rn <= $topN""".stripMargin

  /** Prototypicality-based outlier flagging (the SSL-prototypes pruning
    * recipe, Sorscher et al. 2022: distance to the cluster prototype is
    * the data-pruning signal): assign every vector to its k-means cell,
    * rank WITHIN the cell by ascending cosine-to-centroid, flag the
    * bottom `perCluster` as outliers — candidates for pruning (or, under
    * the opposite policy, the hard examples worth keeping). The window is
    * cluster-partitioned (k partitions, never global); everything else is
    * the zero-shuffle assignment scan kmeans already does. */
  def docOutliers(embeddings: DataFrame, k: Int = 8, iters: Int = 1,
                  perCluster: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("cos_to_centroid"), col("vec_id"))
    kmeans(embeddings, k, iters)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perCluster)
      .select(col("vec_id"), col("cluster"), col("cos_to_centroid"), col("rank"))
  }

  def docOutliersSql(k: Int = 8, iters: Int = 1, perCluster: Int = 5): String = {
    val cos = VectorOps.cosineSql("e.embedding", "c.embedding")
    s"""WITH ${centsSql(k, iters)},
       |asg AS (
       |  SELECT e.vec_id, c.cell AS cluster, $cos AS cos_to_centroid
       |  FROM embeddings e CROSS JOIN cents_$iters c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.cell) = 1),
       |rk AS (
       |  SELECT vec_id, cluster, cos_to_centroid,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY cluster
       |                            ORDER BY cos_to_centroid, vec_id) AS BIGINT) AS rank
       |  FROM asg)
       |SELECT vec_id, cluster, cos_to_centroid, rank FROM rk WHERE rank <= $perCluster""".stripMargin
  }
}
