package graft.sources

import org.apache.spark.sql.DataFrame

/** Store step of the ingestion pipeline (services/pipeline/storers.py) —
  * in the reference chunks+embeddings land in Neo4j; here they land as
  * partitioned, compacted parquet: the lakehouse encoding that scales to
  * 100 TB and that every downstream graft operator reads.
  */
object Writers {

  /** Row-group byte bound pinned on every parquet write below (default
    * 32 MiB; override per session via `spark.graft.parquetBlockBytes`).
    * A single oversized row group is UNSPLITTABLE — the whole file scans
    * on one task regardless of cluster size (the SURVEY §5 fan-out trap
    * that serialized the round-5 stress sweeps) — so the writers state
    * the bound explicitly instead of inheriting the session default.
    * WritersSpec reads footers back and asserts multi-row-group output. */
  def rowGroupBytes(df: DataFrame): Long =
    df.sparkSession.conf
      .get("spark.graft.parquetBlockBytes", (32L * 1024 * 1024).toString).toLong

  /** Write a chunk/embedding table partitioned by a low-cardinality key,
    * compacted to sane file counts (the small-file problem is the #1
    * operational failure of big ingestion jobs). The REBALANCE hint lets
    * AQE size the output partitions from the runtime shuffle statistics —
    * one pass over the data, vs the count()+repartition two-pass. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.hint("rebalance", org.apache.spark.sql.functions.col(partitionCol))
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes(df))
      .partitionBy(partitionCol)
      .parquet(path)

  /** Append-mode variant for incremental ingestion batches. */
  def appendBatch(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("append")
      .option("parquet.block.size", rowGroupBytes(df))
      .partitionBy(partitionCol).parquet(path)

  /** Bucketed catalog table: pre-hash-partition + sort by the join key at
    * write time so every later equi-join/aggregation on that key runs with
    * ZERO shuffle (co-located, sort-merge without exchange). The right
    * answer for fact tables joined repeatedly on the same key at 100 TB —
    * pay the shuffle once at ingest, never again. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit =
    writeBucketedCols(df, table, Seq(key), buckets)

  /** Multi-column variant of [[writeBucketed]] — the store layout for
    * composite join keys (e.g. the LSH band index joined on (band, bkey)):
    * rows co-locate by the hash of ALL key columns, so the equi-join on
    * that exact key set runs exchange-free. */
  def writeBucketedCols(df: DataFrame, table: String, keys: Seq[String],
                        buckets: Int = 32): Unit = {
    require(keys.nonEmpty, "writeBucketedCols needs at least one bucket key")
    df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes(df))
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Z-order (Morton) interleave of two non-negative integer keys: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Rows close in BOTH
    * dimensions get close z-values, so range-partitioning + sorting by the
    * z-value clusters them into the same files — parquet min/max stats
    * then prune scans filtered on EITHER key (the Delta/Iceberg
    * OPTIMIZE ZORDER layout primitive). Pure codegen'd bit math, portable
    * to the oracle verbatim. */
  def zorder2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
              bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  def zorder2Sql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " + ", ")")

  /** Hilbert-curve distance of a 2-D key (the layout Databricks OPTIMIZE
    * prefers over Z-order): unlike Morton, CONSECUTIVE Hilbert values are
    * always spatially adjacent cells (no diagonal jumps across the plane),
    * so file key-ranges stay tighter and min/max pruning prunes more. The
    * classic bitwise xy2d walk (quadrant digit + rotate) is inherently
    * sequential in the bit levels with state (x, y, d) — unrolling it as a
    * Catalyst expression tree would blow up exponentially (x and y each
    * feed the next level 2-3 times), so the engine side is a narrow JVM
    * kernel (zero shuffle, codegen irrelevant at one call/row) and the
    * oracle unrolls the same walk as one CTE per bit level, where columns
    * materialize per step and the blowup vanishes. */
  def hilbertXY2D(a: Long, b: Long, bits: Int = 16): Long = {
    require(bits > 0 && bits < 32, s"bits must be in [1,31]: $bits")
    val n = 1L << bits
    var x = a & (n - 1L)
    var y = b & (n - 1L)
    var d = 0L
    var s = n >> 1
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1L - x; y = n - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** (key_a, key_b, hval) over a two-column DataFrame via the kernel. */
  def hilbertKeys(df: DataFrame, colA: String, colB: String, bits: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(colA).cast("long"),
        org.apache.spark.sql.functions.col(colB).cast("long"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (a, b) => (a, b, hilbertXY2D(a, b, bits)) })
      .toDF(colA, colB, "hval")
  }

  /** One CTE per bit level; each step's (x, y, d) are materialized columns
    * so the state walk stays linear-sized. */
  def hilbertSql(a: String, b: String, table: String, bits: Int = 16): String = {
    val n = 1L << bits
    val steps = (0 until bits).map { i =>
      val s = n >> (i + 1)
      val rx = s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END"
      val ry = s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END"
      s"""h${i + 1} AS (
         |  SELECT ka, kb,
         |    CASE WHEN $ry = 0 THEN
         |      CASE WHEN $rx = 1 THEN ${n - 1} - y ELSE y END
         |    ELSE x END AS x,
         |    CASE WHEN $ry = 0 THEN
         |      CASE WHEN $rx = 1 THEN ${n - 1} - x ELSE x END
         |    ELSE y END AS y,
         |    d + CAST($s AS BIGINT) * $s * xor(3 * ($rx), $ry) AS d
         |  FROM h$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (
       |  SELECT $a AS ka, $b AS kb,
       |    $a & ${n - 1} AS x, $b & ${n - 1} AS y, CAST(0 AS BIGINT) AS d
       |  FROM $table),
       |$steps
       |SELECT ka AS $a, kb AS $b, d AS hval FROM h$bits""".stripMargin
  }

  /** Graph export (neo4j_knowledge_service.py `export_graph`): persist the
    * node and edge tables as partitioned parquet — the lakehouse graph
    * snapshot any engine (or a later graft run) can re-read. Edges
    * partition by rel type (the reference exports per-type sections);
    * nodes ride the REBALANCE-compacted writer. */
  def exportGraph(nodes: DataFrame, edges: DataFrame, dir: String): Unit = {
    writePartitioned(edges, s"$dir/edges", "rel")
    nodes.hint("rebalance")
      .write.mode("overwrite").parquet(s"$dir/nodes")
  }

  /** Oracle-checkable exportGraph round-trip (the CORRECTNESS row for the
    * write path): derive the node/edge tables from orders+lineitem, persist
    * them through `exportGraph`, read the snapshot BACK from parquet, and
    * return every edge joined to both endpoint labels. The inner joins make
    * the check row-level on BOTH tables — a node row lost (or an edge row
    * corrupted) in the write/read cycle drops or changes output rows, so the
    * DuckDB oracle (which computes the same snapshot directly from the base
    * tables, never touching our parquet) hash-catches it.
    *
    * Scale shape: nodes = one distinct over the edge endpoints (single
    * shuffle); the label joins are id-range CASE lookups the optimizer can
    * co-partition with the edge shuffle. The snapshot write itself is the
    * REBALANCE-compacted/partitioned path already used everywhere. */
  def exportGraphSnapshot(orders: DataFrame, lineitem: DataFrame, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.GraphOps
    val edges = GraphOps.edges(orders, lineitem)
    val label = (n: org.apache.spark.sql.Column) =>
      when(n < GraphOps.OrderBase, "customer")
        .when(n < GraphOps.PartBase, "order")
        .when(n < GraphOps.SuppBase, "part")
        .otherwise("supplier")
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct()
      .withColumn("label", label(col("node")))
    exportGraph(nodes, edges, dir)
    val spark = orders.sparkSession
    val n2 = spark.read.parquet(s"$dir/nodes")
    val e2 = spark.read.parquet(s"$dir/edges")
    e2.join(n2.select(col("node").as("src"), col("label").as("src_label")), "src")
      .join(n2.select(col("node").as("dst"), col("label").as("dst_label")), "dst")
      .select(col("src"), col("dst"), col("rel"), col("src_label"), col("dst_label"))
  }

  /** Oracle twin: the same snapshot computed straight from the base tables. */
  val exportGraphSnapshotSql: String = {
    import graft.operators.GraphOps
    s"""WITH e AS (${GraphOps.edgesSql}),
       |n AS (
       |  SELECT node,
       |    CASE WHEN node < ${GraphOps.OrderBase} THEN 'customer'
       |         WHEN node < ${GraphOps.PartBase} THEN 'order'
       |         WHEN node < ${GraphOps.SuppBase} THEN 'part'
       |         ELSE 'supplier' END AS label
       |  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e))
       |SELECT e.src, e.dst, e.rel, ns.label AS src_label, nd.label AS dst_label
       |FROM e JOIN n ns ON ns.node = e.src JOIN n nd ON nd.node = e.dst""".stripMargin
  }

  /** Write the corpus in deterministic shuffled (training) order: range-
    * partition + sort by the reproducible shuffle key so shard files read
    * back in key order ARE the shuffled corpus. One range shuffle; no
    * global rank. */
  def writeShuffled(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    val key = pmod(col("doc_id").bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L, lit(1000003L))
    df.withColumn("__sk", key)
      .repartitionByRange(col("__sk"))
      .sortWithinPartitions("__sk")
      .drop("__sk")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` clustered by the z-order of two keys: range-partition on
    * the z-value (balanced output files), sort within partitions so
    * parquet row-group min/max stats stay tight on both dimensions. */
  def writeZOrdered(df: DataFrame, path: String, keyA: String, keyB: String,
                    bits: Int = 16): Unit = {
    val z = zorder2(org.apache.spark.sql.functions.col(keyA),
      org.apache.spark.sql.functions.col(keyB), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
