package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, MinhashPortable, Search}

/** The DELETE direction of the index-maintenance family (bm25_delete /
  * minhash_lsh_delete / graph_components_del): subtractive maintenance must
  * equal the from-scratch recompute on the post-delete corpus, and
  * delete-then-reinsert of the same batch must be the identity on the
  * index (composed through the public upsert surfaces). */
class DeleteMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("bm25_delete: subtractive maintenance == from-scratch survivor index") {
    val terms = Seq("alpha", "beta")
    // 10 and 20 are deleted (%10==0). 10 is the ONLY doc with 'beta' among
    // the survivors' complement — its df must reach 0 and drop out; 20
    // carries both terms so both df columns decrement.
    val all = docs(Seq(
      (1L, "alpha x y alpha z"), (2L, "x y z w"), (3L, "alpha q r"),
      (10L, "beta beta n m"), (20L, "alpha beta k")))
    val del = Search.bm25Delete(all, terms).as[(Long, Double)].collect().toSeq
    // from-scratch reference: index built over survivors only, scored with
    // an empty delete batch
    val survivors = all.filter(col("doc_id") % 10 =!= 0)
    val (post, dl) = Search.bm25IndexParts(survivors)
    val dfF = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scF = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    val scratch = Search.bm25DeleteFrom(post, dl, dfF, scF,
      docs(Seq.empty[(Long, String)]), terms).as[(Long, Double)].collect().toSeq
    assert(del == scratch, s"subtractive != from-scratch: $del vs $scratch")
    val ids = del.map(_._1)
    assert(ids.toSet == Set(1L, 3L), "deleted docs leaked or survivors lost")
  }

  test("bm25 delete-then-reinsert is the identity (composed via upsert)") {
    val terms = Seq("alpha", "beta")
    val all = docs(Seq(
      (1L, "alpha x y alpha z"), (2L, "x y z w"), (3L, "alpha q r"),
      (10L, "beta beta n m"), (20L, "alpha beta k")))
    val batch = all.filter(col("doc_id") % 10 === 0)
    // full standing index → delete the batch → reinsert the same batch
    val (post, dl) = Search.bm25IndexParts(all)
    val dfF = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scF = dl.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    val (postM, dlM, dfM, scM) = Search.bm25DeleteArtifacts(post, dl, dfF, scF, batch)
    val roundTrip = Search.bm25UpsertFrom(postM, dlM, dfM, scM, batch, terms)
      .as[(Long, Double)].collect().toSeq
    // identity reference: the untouched full index scored directly
    val direct = Search.bm25UpsertFrom(post, dl, dfF, scF,
      docs(Seq.empty[(Long, String)]), terms).as[(Long, Double)].collect().toSeq
    assert(roundTrip == direct, s"delete+reinsert != identity: $roundTrip vs $direct")
  }

  test("minhash_lsh_delete: maintained index == from-scratch survivor sketch") {
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (50 to 80).map(i => s"b$i").mkString(" ")
    // pair (10,11) dies with deleted 10; pair (1,2) survives untouched;
    // deleted 20 pairs with nothing after the delete
    val all = docs(Seq((10L, a), (11L, a), (1L, b), (2L, b), (20L, a)))
    val del = MinhashPortable.minhashLshDelete(all)
      .as[(Long, Long, Double)].collect().toSet
    val scratch = MinhashPortable.minhashLshPortable(
        all.filter(col("doc_id") % 10 =!= 0))
      .as[(Long, Long, Double)].collect().toSet
    assert(del == scratch, s"maintained != from-scratch: $del vs $scratch")
    assert(del.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("minhash_lsh delete-then-reinsert is the identity (composed via upsert)") {
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val all = docs(Seq((10L, a), (11L, a), (20L, a)))
    val batch = all.filter(col("doc_id") % 10 === 0)
    val sig = MinhashPortable.minhashPortable(all)
    val keys = MinhashPortable.bandKeys(sig, 4)
    val (sigM, keysM) = MinhashPortable.lshDeleteArtifacts(
      sig, keys, batch.select(col("doc_id")))
    // reinsert through the upsert path: pairs touching the batch
    val roundTrip = MinhashPortable.minhashLshUpsertFrom(sigM, keysM, batch)
      .as[(Long, Long, Double)].collect().toSet
    val direct = MinhashPortable.minhashLshPortable(all)
      .as[(Long, Long, Double)].collect()
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0).toSet
    assert(roundTrip == direct, s"delete+reinsert != identity: $roundTrip vs $direct")
  }

  test("minhash_lsh_delete_retired: retired ⊎ surviving partitions the full pair set") {
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (50 to 80).map(i => s"b$i").mkString(" ")
    val all = docs(Seq((10L, a), (11L, a), (1L, b), (2L, b), (20L, a)))
    val retired = MinhashPortable.minhashLshDeleteRetired(all)
      .select("doc_a", "doc_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val surviving = MinhashPortable.minhashLshDelete(all)
      .as[(Long, Long, Double)].collect().toSet
    val full = MinhashPortable.minhashLshPortable(all)
      .as[(Long, Long, Double)].collect().toSet
    assert(retired.intersect(surviving).isEmpty, "a pair both retired and surviving")
    assert(retired.union(surviving) == full,
      s"retired ⊎ surviving != full: ${retired.union(surviving)} vs $full")
    // pairs touching deleted 10/20: (10,11), (10,20), (11,20) retired;
    // (1,2) survives
    assert(retired.map(p => (p._1, p._2)) == Set((10L, 11L), (10L, 20L), (11L, 20L)))
  }

  test("ivf_delete: keyed drop excludes deleted ids; delete-then-reinsert is the identity") {
    import graft.operators.Dedup
    // hand-built standing inverted file under a frozen 2-cell quantizer:
    // cell 0 ~ (1,0), cell 1 ~ (0,1); ids 0 and 10 are the delete batch
    def v(x: Float, y: Float) = Array(x, y)
    val idx = Seq(
      (0L, v(1f, 0.1f), 0L), (1L, v(1f, 0.2f), 0L), (2L, v(1f, 0.3f), 0L),
      (3L, v(0.1f, 1f), 1L), (4L, v(0.2f, 1f), 1L), (10L, v(0.3f, 1f), 1L))
      .toDF("vec_id", "embedding", "cell")
    val delIds = Seq(0L, 10L).toDF("vec_id")
    val none = Seq.empty[Long].toDF("vec_id")
    val afterDel = Dedup.ivfDeleteFrom(idx, delIds, nProbes = 5, k = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(afterDel.nonEmpty)
    assert(afterDel.forall(r => r._1 != 0L && r._1 != 10L && r._2 != 0L && r._2 != 10L),
      "a deleted id survived as probe or neighbor")
    // reinsert: cell assignment is a pure function of the frozen quantizer,
    // so re-adding the batch restores the exact index rows → search over
    // (dropped ∪ batch) must equal search over the untouched index
    val dropped = idx.join(delIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val batchRows = idx.join(delIds, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val roundTrip = Dedup.ivfDeleteFrom(dropped.unionByName(batchRows), none,
      nProbes = 5, k = 2).as[(Long, Long, Long, Double)].collect().toSet
    val direct = Dedup.ivfDeleteFrom(idx, none, nProbes = 5, k = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(roundTrip == direct, s"delete+reinsert != identity: $roundTrip vs $direct")
  }

  test("graph_components_del: scoped recompute splits only touched components") {
    // base orders (all %100==0, %1000!=0): {1,2,3} chained via orders
    // 1100/2100, {8,9} via 3100, {20,21} via 4100. Deleted order 5000
    // (%1000==0) is the ONLY bridge 3—8: deleting it splits the merged
    // {1,2,3,8,9} back into {1,2,3} and {8,9}; {20,21} untouched.
    val mk = (rows: Seq[(Long, Long)]) => rows.toDF("l_orderkey", "l_partkey")
    val li = mk(Seq((1100L, 1L), (1100L, 2L), (2100L, 2L), (2100L, 3L),
      (3100L, 9L), (3100L, 8L), (4100L, 20L), (4100L, 21L),
      (5000L, 3L), (5000L, 8L)))
    val out = GraphOps.componentsDelete(li).as[(Long, Long)].collect().toMap
    val scratch = GraphOps.connectedComponents(
        li.filter(col("l_orderkey") % 1000 =!= 0))
      .as[(Long, Long)].collect().toMap
    assert(out == scratch, s"scoped != full recompute: $out vs $scratch")
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L) && Seq(8L, 9L).forall(out(_) == 8L),
      "split did not re-canonicalize the two parts")
    assert(out(20L) == 20L && out(21L) == 20L, "untouched component relabeled")
  }

  test("graph_components_del: node losing all edges drops out; " +
       "delete-then-reinsert is the identity") {
    // order 5000 is the only order containing part 50 → after deletion 50
    // must vanish from the labeling (full recompute has no such node)
    val mk = (rows: Seq[(Long, Long)]) => rows.toDF("l_orderkey", "l_partkey")
    val li = mk(Seq((1100L, 1L), (1100L, 2L), (3100L, 9L), (3100L, 8L),
      (5000L, 2L), (5000L, 50L), (5000L, 8L)))
    val afterDel = GraphOps.componentsDelete(li).as[(Long, Long)].collect().toMap
    assert(!afterDel.contains(50L), "orphaned node survived the delete")
    assert(afterDel == Map(1L -> 1L, 2L -> 1L, 8L -> 8L, 9L -> 8L))
    // reinsert the deleted order's edges through the upsert path: the
    // standing labeling must return to the full-graph labeling
    val delEdges = GraphOps.copurchase(li.filter(col("l_orderkey") % 1000 === 0))
    val labelsAfterDel = GraphOps.componentsDelete(li)
    val roundTrip = GraphOps.componentsUpsertFrom(labelsAfterDel, delEdges)
      .as[(Long, Long)].collect().toMap
    val full = GraphOps.connectedComponents(li).as[(Long, Long)].collect().toMap
    assert(roundTrip == full, s"delete+reinsert != identity: $roundTrip vs $full")
  }

  // --- turnstile_distinct: the sketch family's delete direction ------------

  private def events(rows: Seq[(Long, Long, String)]) =
    rows.toDF("event_id", "user_id", "event_type")

  // user 1 loses ONE of two 'click' events (partial decrement — survives);
  // user 2's only 'click' is deleted (vanishes); user 3 untouched;
  // user 2's 'view' survives (per-(type,user) isolation)
  private val turnstileEvents = events(Seq(
    (1L, 1L, "click"), (15L, 1L, "click"),
    (25L, 2L, "click"), (3L, 2L, "view"),
    (4L, 3L, "click")))

  test("turnstile_distinct: subtraction == from-scratch post-delete recompute") {
    import graft.operators.Corpus
    val emptyDel = turnstileEvents.filter(lit(false))
    val got = Corpus.turnstileDistinct(turnstileEvents)
      .as[(String, Long, Double)].collect().toSet
    val scratch = Corpus.turnstileDistinctFrom(
      Corpus.turnstileCounts(turnstileEvents.filter(col("event_id") % 10 =!= 5), 1L),
      emptyDel).as[(String, Long, Double)].collect().toSet
    assert(got == scratch, s"turnstile != from-scratch: $got vs $scratch")
    assert(got.map(r => (r._1, r._2)) == Set(("click", 2L), ("view", 1L)),
      s"partial decrement / vanish semantics wrong: $got")
  }

  test("turnstile_distinct: delete-then-reinsert is the identity on the counts") {
    import graft.operators.Corpus
    val standing = Corpus.turnstileCounts(turnstileEvents, 1L)
    val batch = turnstileEvents.filter(col("event_id") % 10 === 5)
    val roundTrip = standing
      .unionByName(Corpus.turnstileCounts(batch, -1L))
      .unionByName(Corpus.turnstileCounts(batch, 1L))
    val emptyDel = turnstileEvents.filter(lit(false))
    val a = Corpus.turnstileDistinctFrom(roundTrip, emptyDel)
      .as[(String, Long, Double)].collect().toSet
    val b = Corpus.turnstileDistinctFrom(standing, emptyDel)
      .as[(String, Long, Double)].collect().toSet
    assert(a == b, s"delete+reinsert != identity: $a vs $b")
  }
}
