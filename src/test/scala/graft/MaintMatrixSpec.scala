package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cluster, ProductQuant}
import graft.sources.{Stores, Tables}

/** Maintenance-direction identities for the two families the r14 session
  * closed last: IVF-PQ (FAISS add/remove_ids over the persisted codes) and
  * semdedup (created/retired pair deltas over the trained partition).
  * Each test pins the algebra the CORRECTNESS gate then re-proves against
  * DuckDB: maintained state ≡ from-scratch state of the post-change
  * corpus, delta emission ⊎ unchanged ≡ post-state, and
  * delete-then-reinsert is the identity. */
class MaintMatrixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def isArr = pmod(col("vec_id"), lit(10L)) === 0L

  test("ivf_pq_upsert: base codes + arrival encode under the frozen model " +
    "serve exactly the from-scratch full-corpus search") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    assert(rows(ProductQuant.ivfPqUpsert(emb)) ===
      rows(ProductQuant.ivfPqSearchFromCodes(emb, ProductQuant.ivfPqIndex(emb))))
  }

  test("ivf_pq delete-then-reinsert is the identity on the codes table") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val codes = ProductQuant.ivfPqIndex(emb)
    val delIds = emb.filter(isArr).select(col("vec_id"))
    val reinserted = codes.join(broadcast(delIds), Seq("vec_id"), "left_anti")
      .unionByName(ProductQuant.ivfPqEncodeSlice(emb.filter(isArr), emb))
    assert(rows(reinserted.orderBy("vec_id")) === rows(codes.orderBy("vec_id")))
  }

  test("ivf_pq_upsert_store equals the inline upsert") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    assert(rows(Stores.ivfPqUpsertStore(s, dir)) ===
      rows(ProductQuant.ivfPqUpsert(emb)))
  }

  test("ivf_pq_drift: per-cell populations partition the corpus and " +
    "quantization errors are non-negative") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val drift = ProductQuant.ivfPqDrift(emb).collect()
    assert(drift.map(r => r.getLong(1) + r.getLong(2)).sum === emb.count())
    drift.foreach { r =>
      if (!r.isNullAt(3)) assert(r.getDouble(3) >= 0.0)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0)
    }
  }

  test("persisted PQ model (ivfPqModelStore) is bit-identical to the " +
    "per-call derived model") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val (dc, db) = ProductQuant.ivfPqModel(emb, 16, 32, 128)
    val (pc, pb) = Stores.ivfPqModelStore(s, dir)
    assert(pc.length === dc.length)
    pc.zip(dc).foreach { case ((pid, pv), (did, dv)) =>
      assert(pid === did); assert(pv.toSeq === dv.toSeq)
    }
    assert(pb.length === db.length)
    pb.zip(db).foreach { case (ps, ds) =>
      assert(ps.length === ds.length)
      ps.zip(ds).foreach { case (pcw, dcw) => assert(pcw.toSeq === dcw.toSeq) }
    }
  }

  test("ivf_pq_delete_store equals the inline delete") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    assert(rows(Stores.ivfPqDeleteStore(s, dir)) ===
      rows(ProductQuant.ivfPqDelete(emb)))
  }

  test("semdedup_upsert: created pairs ⊎ standing base pairs = the " +
    "post-upsert pair set under the base-trained frozen quantizer") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val base = emb.filter(!isArr)
    val cents = Cluster.trainCentroids(base, Cluster.scaledK(base), iters = 1)
    val standingPairs = Cluster.semdedupPairsFrom(Cluster.assignUnder(base, cents))
    val postPairs = Cluster.semdedupPairsFrom(Cluster.assignUnder(emb, cents))
    val created = Cluster.semdedupUpsert(emb)
    assert(rows(created).intersect(rows(standingPairs)).isEmpty,
      "created pairs must be NEW — no restatement of the standing set")
    assert(rows(created) ++ rows(standingPairs) === rows(postPairs))
  }

  test("semdedup_delete: standing pairs ∖ retired = the survivor pair set " +
    "under the frozen quantizer") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val cents = Cluster.trainCentroids(emb, Cluster.scaledK(emb), iters = 1)
    val standingPairs = Cluster.semdedupPairsFrom(Cluster.assignUnder(emb, cents))
    val survivorPairs = Cluster.semdedupPairsFrom(
      Cluster.assignUnder(emb.filter(!isArr), cents))
    val retired = Cluster.semdedupDelete(emb)
    assert(rows(standingPairs) -- rows(retired) === rows(survivorPairs))
    assert(rows(retired).subsetOf(rows(standingPairs)),
      "retired pairs must all have been standing")
  }

  test("semdedup_hier_upsert: created pairs ⊎ standing base pairs = the " +
    "post-upsert pair set under the base-trained two-level model") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val (cents, seeds, coarseTrain) =
      Cluster.hierModel(emb.filter(!isArr), 64, 64, 8, 4096, 1)
    val standing = Cluster.semdedupPairsFrom(
      Cluster.hierAssignUnder(emb.filter(!isArr), cents, seeds))
    val postPairs = Cluster.semdedupPairsFrom(
      Cluster.hierAssignUnder(emb, cents, seeds))
    val created = Cluster.semdedupHierUpsert(emb)
    coarseTrain.count() // touch the materialized frame before comparing
    assert(rows(created).intersect(rows(standing)).isEmpty)
    assert(rows(created) ++ rows(standing) === rows(postPairs))
  }

  test("semdedup_hier_delete: standing ∖ retired = survivor pairs under " +
    "the frozen two-level model; hier store equals inline pairs") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    val standing = Cluster.semdedupPairsFrom(
      Cluster.hierAssigned(emb, 64, 64, 8, 4096, 1))
    val retired = Cluster.semdedupHierDelete(emb)
    val survivors = {
      val (cents, seeds, _) = Cluster.hierModel(emb, 64, 64, 8, 4096, 1)
      Cluster.semdedupPairsFrom(
        Cluster.hierAssignUnder(emb.filter(!isArr), cents, seeds))
    }
    assert(rows(standing) -- rows(retired) === rows(survivors))
    assert(rows(Stores.semdedupHierStore(s, dir)) === rows(standing))
  }

  test("semdedup store twins equal their inline forms") {
    val s = spark
    val emb = Tables.embeddings(s, dir)
    assert(rows(Stores.semdedupUpsertStore(s, dir)) ===
      rows(Cluster.semdedupUpsert(emb)))
    assert(rows(Stores.semdedupDeleteStore(s, dir)) ===
      rows(Cluster.semdedupDelete(emb)))
    assert(rows(Stores.semdedupHierUpsertStore(s, dir)) ===
      rows(Cluster.semdedupHierUpsert(emb)))
  }

  test("semdedup_upsert_store plan: zero shuffle exchange — the standing " +
    "bucketed scan is probed by the broadcast arrival side in place") {
    val s = spark
    Stores.semdedupUpsertStore(s, dir).count() // ensure stores exist
    val exchanges = Stores.semdedupUpsertStore(s, dir)
      .queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    assert(exchanges.isEmpty,
      s"standing side must never shuffle: ${exchanges.mkString(";")}")
  }

  test("semdedup_hier_upsert_store plan: the persisted partition scan is " +
    "never under a shuffle exchange") {
    val s = spark
    Stores.semdedupHierUpsertStore(s, dir).count()
    val shuffledScans = Stores.semdedupHierUpsertStore(s, dir)
      .queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.collectLeaves().collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.tableIdentifier.map(_.table).getOrElse("")
          }
      }.flatten.filter(_.startsWith("graft_store_sdh_asg_base"))
    assert(shuffledScans.isEmpty,
      s"persisted partition must not shuffle: $shuffledScans")
  }

  test("cms_turnstile: signed composition equals the from-scratch sketch " +
    "of the post-change corpus, and estimates keep the CMS guarantee") {
    val s = spark
    val docs = Tables.documents(s, dir)
    val composed = graft.operators.CountMin.cmsTurnstile(docs)
    val scratch = graft.operators.CountMin.cmsFreq(
      docs.filter(pmod(col("doc_id"), lit(10L)) =!= 5L))
    assert(rows(composed) === rows(scratch))
    composed.collect().foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"est < tf in $r")
    }
  }

  test("cms_turnstile: the stored sketch's (row, cell, total) set equals " +
    "the from-scratch sketch — retired cells actually drop") {
    val s = spark
    val docs = Tables.documents(s, dir)
    // the composed sketch filters total == 0 cells; the from-scratch
    // post-change sketch never materializes them — set equality pins the
    // cell-drop behavior the estimates-only gate can't see
    assert(rows(graft.operators.CountMin.turnstileSketch(docs)) ===
      rows(graft.operators.CountMin.scratchSketch(
        docs.filter(pmod(col("doc_id"), lit(10L)) =!= 5L))))
  }

  test("semdedup upsert read path never trains: the model comes from the " +
    "persisted cents table") {
    val s = spark
    // the store read path's plan touches only catalog store tables + the
    // raw embeddings scan for the arrival slice — no Lloyd aggregation
    // (posexplode/groupBy over the corpus) appears in the final plan
    val plan = Stores.semdedupUpsertStore(s, dir)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("posexplode"),
      s"read path must not re-train the quantizer:\n$plan")
  }
}
