package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Incremental re-ingest — the WRITE-path twin of rag_retrieve_portable,
  * composing the pipeline the reference drives from changed files
  * (`services/utils/git_utils.py:105 get_changed_files` → re-chunk →
  * re-embed → upsert): snapshot diff at DOC level decides what moved,
  * only the changed/added docs are re-chunked and re-embedded, and the
  * chunk index is merged in ONE full-outer join keyed by chunk_id
  * (cdc_apply's MERGE shape). Each surviving chunk is assigned its IVF
  * cell against the bounded broadcast centroids (ivf_upsert's
  * maintenance pass), so the output is the complete post-refresh index
  * state: which chunks were kept / updated / inserted, where they live.
  *
  * Scale shape: the diff is one doc_id-keyed join carrying 16-byte
  * digests; re-chunking touches ONLY the delta (the whole point of
  * incremental ingest); the merge is one chunk_id-keyed full-outer join
  * (bucketed co-location at 100 TB); cell assignment is a narrow
  * broadcast-argmax scan. Nothing quadratic, nothing global. (Here kept
  * chunks also re-embed so the oracle can check every emitted cell; at
  * scale their cells are READ from the existing index — the values are
  * identical by construction, which is exactly what the oracle proves.)
  *
  * The test corpus stands in for both snapshots deterministically
  * (snapshot_diff's convention): OLD = doc_id % 5 != 4, NEW = doc_id % 3
  * != 2 with text suffixed ' v2' when doc_id % 7 == 0. Because chunking
  * is content-defined windows, a changed doc's untouched leading chunks
  * come out `kept` and only the tail chunk(s) actually re-embed — the
  * behavior an incremental pipeline exists to deliver.
  */
object RagRefresh {

  /** Post-refresh chunk index: (chunk_id, doc_id, action, cell, h).
    * action ∈ inserted | updated | kept; deleted chunks (removed docs,
    * doc shrinkage) leave the index. cell = argmax-cosine IVF cell of
    * the chunk's portable embedding against the first-nCells centroids.
    *
    * chunk_id = doc_id * 1000 + chunk_index ASSUMES < 1000 chunks per doc
    * (~450 KB of text at the 512/64 chunking defaults) — doc 1001's id
    * space starts where doc 1's would overflow into. The merge join here
    * also keys on doc_id, so THIS operator's output stays consistent
    * regardless, but a downstream index keyed on chunk_id alone would
    * collide. (Inherited from Embedding.scala's chunk-id convention; at
    * production chunk counts widen the multiplier or key on the
    * (doc_id, chunk_index) struct.) */
  def ragRefresh(documents: DataFrame, embeddings: DataFrame,
                 nCells: Int = 16): DataFrame = {
    require(nCells > 0, s"bad nCells=$nCells")
    import embeddings.sparkSession.implicits._
    val oldc = documents.filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), col("text"))
    val neu = documents.filter(col("doc_id") % 3 =!= 2)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    // doc-level delta: what must re-ingest (added/changed), what must go
    val status = oldc.select(col("doc_id"), md5(col("text")).as("oh"))
      .join(neu.select(col("doc_id"), md5(col("text")).as("nh")), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("oh").isNull, "added")
          .when(col("nh").isNull, "removed")
          .when(col("oh") =!= col("nh"), "changed")
          .otherwise("unchanged").as("status"))
    val base = Chunking.chunkFixed(oldc)
      .select((col("doc_id") * 1000 + col("chunk_index")).as("chunk_id"),
        col("doc_id"), col("chunk_text").as("old_text"), md5(col("chunk_text")).as("old_h"))
    // the delta — ONLY added/changed docs re-chunk (and later re-embed)
    val ups = Chunking.chunkFixed(
        neu.join(status.filter(col("status").isin("added", "changed")), "doc_id"))
      .select((col("doc_id") * 1000 + col("chunk_index")).as("chunk_id"),
        col("doc_id"), col("chunk_text").as("new_text"), md5(col("chunk_text")).as("new_h"))
    val merged = base.join(ups, Seq("chunk_id", "doc_id"), "full_outer")
      .join(status, "doc_id")
      .withColumn("action",
        when(col("status") === "removed", "deleted")
          .when(col("new_h").isNotNull && col("old_h").isNull, "inserted")
          .when(col("new_h").isNotNull && col("new_h") =!= col("old_h"), "updated")
          .when(col("new_h").isNotNull, "kept") // changed doc, chunk content identical
          // no upsert row: a changed doc's vanished tail chunk is deleted,
          // an unchanged doc's chunk is kept as-is
          .when(col("status") === "changed", "deleted")
          .otherwise("kept"))
      .filter(col("action") =!= "deleted")
      .select(col("chunk_id"), col("doc_id"), col("action"),
        coalesce(col("new_text"), col("old_text")).as("chunk_text"),
        coalesce(col("new_h"), col("old_h")).as("h"))
    // ivf cell maintenance: centroids ship via sparkContext.broadcast (once
    // per executor — at production cell counts inlining them as plan
    // literals re-serializes the whole array into every task binary), then
    // a narrow argmax kernel. The fold + tie-break are bit-identical to the
    // previous greatest(struct(cosine, -id)) form: CosineSimFF's sequential
    // double accumulation, ties on cosine → smaller cell id, and
    // Double.compare ordering (NaN greatest) matching Spark's struct sort.
    val cents: Array[(Long, Array[Float])] = embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val bcCents = merged.sparkSession.sparkContext.broadcast(cents)
    val vecs = Embedding.embedPortableVec(merged, "chunk_id", "chunk_text")
      .select(col("id").as("chunk_id"), col("embedding"))
    val cells = vecs.select(col("chunk_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cs = bcCents.value
        iter.map { case (chunkId, v) =>
          var bestId = cs(0)._1
          var bestCos = VectorOps.cosineFF(v, cs(0)._2)
          var ci = 1
          while (ci < cs.length) {
            val c = VectorOps.cosineFF(v, cs(ci)._2)
            if (java.lang.Double.compare(c, bestCos) > 0) {
              bestCos = c; bestId = cs(ci)._1
            }
            ci += 1
          }
          (chunkId, bestId)
        }
      }
      .toDF("chunk_id", "cell")
    merged.drop("chunk_text")
      .join(cells, "chunk_id")
      .select(col("chunk_id"), col("doc_id"), col("action"), col("cell"), col("h"))
  }

  /** Oracle twin. Mirrors the Scala side's chunk_id = doc_id * 1000 +
    * chunk_index convention (same < 1000-chunks-per-doc assumption). */
  def ragRefreshSql(nCells: Int = 16, dim: Int = 64): String = {
    val cos = VectorOps.cosineSql("p.pv", "c.embedding", dim)
    s"""WITH oldc AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4),
       |neu AS (
       |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
       |  FROM documents WHERE doc_id % 3 <> 2),
       |status AS (
       |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       |    CASE WHEN o.doc_id IS NULL THEN 'added'
       |         WHEN n.doc_id IS NULL THEN 'removed'
       |         WHEN md5(o.text) <> md5(n.text) THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM oldc o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id),
       |base AS (
       |  SELECT doc_id * 1000 + chunk_index AS chunk_id, doc_id,
       |    chunk_text AS old_text, md5(chunk_text) AS old_h
       |  FROM (${Chunking.chunkFixedSql().replace("FROM documents", "FROM oldc")})),
       |delta AS (
       |  SELECT n.doc_id, n.text FROM neu n
       |  JOIN status s ON s.doc_id = n.doc_id AND s.status IN ('added', 'changed')),
       |ups AS (
       |  SELECT doc_id * 1000 + chunk_index AS chunk_id, doc_id,
       |    chunk_text AS new_text, md5(chunk_text) AS new_h
       |  FROM (${Chunking.chunkFixedSql().replace("FROM documents", "FROM delta")})),
       |merged AS (
       |  SELECT COALESCE(b.chunk_id, u.chunk_id) AS chunk_id,
       |    COALESCE(b.doc_id, u.doc_id) AS doc_id,
       |    CASE WHEN s.status = 'removed' THEN 'deleted'
       |         WHEN u.new_h IS NOT NULL AND b.old_h IS NULL THEN 'inserted'
       |         WHEN u.new_h IS NOT NULL AND u.new_h <> b.old_h THEN 'updated'
       |         WHEN u.new_h IS NOT NULL THEN 'kept'
       |         WHEN s.status = 'changed' THEN 'deleted'
       |         ELSE 'kept' END AS action,
       |    COALESCE(u.new_text, b.old_text) AS chunk_text,
       |    COALESCE(u.new_h, b.old_h) AS h
       |  FROM base b
       |  FULL OUTER JOIN ups u ON b.chunk_id = u.chunk_id AND b.doc_id = u.doc_id
       |  JOIN status s ON s.doc_id = COALESCE(b.doc_id, u.doc_id)),
       |live AS (SELECT * FROM merged WHERE action <> 'deleted'),
       |tk AS (
       |  SELECT chunk_id, unnest(string_split_regex(trim(chunk_text), '\\s+')) AS tok
       |  FROM live),
       |hx AS (
       |  SELECT chunk_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(tok, ''), x -> CAST(ord(x) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % 1000000007) AS hh
       |  FROM tk),
       |ac AS (
       |  SELECT chunk_id, hh % $dim AS dim,
       |    CAST(SUM(CASE WHEN xor((hh * 2654435761 + 40503) % 4294967296,
       |                           ((hh * 2654435761 + 40503) % 4294967296) // 65536) % 2 = 1
       |                  THEN 1 ELSE -1 END) AS BIGINT) AS acc
       |  FROM hx GROUP BY chunk_id, hh % $dim),
       |nm AS (
       |  SELECT chunk_id, CAST(SUM(acc * acc) AS BIGINT) AS sumsq FROM ac GROUP BY chunk_id),
       |grid AS (
       |  SELECT chunk_id, unnest(range(0, $dim)) AS dim FROM nm),
       |pv AS (
       |  SELECT g.chunk_id,
       |    list(CAST(CASE WHEN n.sumsq = 0 THEN 0.0
       |                   ELSE CAST(COALESCE(a.acc, 0) AS DOUBLE) / sqrt(CAST(n.sumsq AS DOUBLE))
       |              END AS FLOAT) ORDER BY g.dim) AS pv
       |  FROM grid g
       |  LEFT JOIN ac a ON a.chunk_id = g.chunk_id AND a.dim = g.dim
       |  JOIN nm n ON n.chunk_id = g.chunk_id
       |  GROUP BY g.chunk_id, n.sumsq),
       |cents AS (SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < $nCells),
       |cells AS (
       |  SELECT p.chunk_id, c.cell_id AS cell
       |  FROM pv p CROSS JOIN cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY p.chunk_id ORDER BY $cos DESC, c.cell_id) = 1)
       |SELECT l.chunk_id, l.doc_id, l.action, cells.cell, l.h
       |FROM live l JOIN cells ON cells.chunk_id = l.chunk_id""".stripMargin
  }
}
