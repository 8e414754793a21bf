package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph queries over a relational edge encoding — the scalable re-expression
  * of the reference's Neo4j/Cypher surface (services/code/graph_service.py,
  * services/graph/). Nodes are typed ids in one namespace; edges are a
  * `(src, dst, rel)` DataFrame. Traversals are joins; k-hop is k self-joins
  * with per-hop distinct to bound frontier growth — the standard distributed
  * BFS shape (Pregel-without-the-framework).
  *
  * Node id namespaces: customer = key; order = key + 1e6; part = key + 2e6;
  * supplier = key + 3e6.
  */
object GraphOps {

  val OrderBase = 1000000L
  val PartBase  = 2000000L
  val SuppBase  = 3000000L

  // per-round materialize + superseded-round release: shared with Pca's
  // power iteration — see Iterative's scaladoc for the checkpoint/release
  // contract
  import Iterative._

  /** Derived edge table: customer −PLACED→ order −CONTAINS→ part,
    *                                  order −SUPPLIED_BY→ supplier. */
  def edges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val placed = orders.select(
      col("o_custkey").as("src"),
      (col("o_orderkey") + OrderBase).as("dst"),
      lit("PLACED").as("rel"))
    val contains = lineitem.select(
      (col("l_orderkey") + OrderBase).as("src"),
      (col("l_partkey") + PartBase).as("dst"),
      lit("CONTAINS").as("rel"))
    val supplied = lineitem.select(
      (col("l_orderkey") + OrderBase).as("src"),
      (col("l_suppkey") + SuppBase).as("dst"),
      lit("SUPPLIED_BY").as("rel"))
    placed.unionAll(contains).unionAll(supplied)
  }

  /** Shared edge-table SQL (DuckDB), kept in lock-step with edges(). */
  val edgesSql: String =
    s"""SELECT o_custkey AS src, o_orderkey + $OrderBase AS dst, 'PLACED' AS rel FROM orders
       |UNION ALL
       |SELECT l_orderkey + $OrderBase, l_partkey + $PartBase, 'CONTAINS' FROM lineitem
       |UNION ALL
       |SELECT l_orderkey + $OrderBase, l_suppkey + $SuppBase, 'SUPPLIED_BY' FROM lineitem""".stripMargin

  /** Per-relationship and node-role counts (get_database_stats analog).
    *
    * Computed WITHOUT materializing the edge union: the node id namespaces
    * are disjoint by construction (customer < OrderBase ≤ order < PartBase ≤
    * part < SuppBase ≤ supplier), so `COUNT(DISTINCT src)` over the union
    * decomposes into per-source-table distinct counts, and each rel count is
    * a plain table count. Two base-table aggregates (full map-side partial
    * aggregation) replace the union + two corpus-wide distinct exchanges —
    * at 100 TB that's the difference between shuffling every edge twice and
    * shuffling a handful of partial counters. The DuckDB oracle still
    * computes the naive union form; `Verify` proves them equal. */
  def stats(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val o = orders.agg(
      count(lit(1)).as("n_placed"),
      countDistinct(col("o_custkey")).as("d_cust"),
      countDistinct(col("o_orderkey")).as("d_ord"))
    val l = lineitem.agg(
      count(lit(1)).as("n_li"),
      countDistinct(col("l_orderkey")).as("d_lord"),
      countDistinct(col("l_partkey")).as("d_part"),
      countDistinct(col("l_suppkey")).as("d_supp"))
    o.crossJoin(l).select(explode(array(
      struct(lit("PLACED").as("kind"), col("n_placed").as("n")),
      struct(lit("CONTAINS").as("kind"), col("n_li").as("n")),
      struct(lit("SUPPLIED_BY").as("kind"), col("n_li").as("n")),
      struct(lit("src_nodes").as("kind"), (col("d_cust") + col("d_lord")).as("n")),
      struct(lit("dst_nodes").as("kind"),
        (col("d_ord") + col("d_part") + col("d_supp")).as("n")))).as("s"))
      .select(col("s.kind").as("kind"), col("s.n").as("n"))
  }

  val statsSql: String =
    s"""WITH e AS ($edgesSql)
       |SELECT rel AS kind, COUNT(*) AS n FROM e GROUP BY rel
       |UNION ALL SELECT 'src_nodes', COUNT(DISTINCT src) FROM e
       |UNION ALL SELECT 'dst_nodes', COUNT(DISTINCT dst) FROM e""".stripMargin

  /** Graph-schema introspection (get_graph_schema analog): the distinct
    * (src_type)-[rel]->(dst_type) triples with edge counts — node types
    * recovered from the id-namespace encoding. */
  def schema(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // Same namespace-disjointness shortcut as stats(): each edge-derivation
    // branch produces exactly one (src_type, rel, dst_type) triple, so the
    // grouped count over the union collapses to two table counts — no edge
    // materialization, no shuffle beyond two scalar aggregates. The oracle
    // keeps the naive union+group form; Verify proves them equal.
    orders.agg(count(lit(1)).as("n_o"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n_l")))
      .select(explode(array(
        struct(lit("customer").as("src_type"), lit("PLACED").as("rel"),
          lit("order").as("dst_type"), col("n_o").as("n_edges")),
        struct(lit("order").as("src_type"), lit("CONTAINS").as("rel"),
          lit("part").as("dst_type"), col("n_l").as("n_edges")),
        struct(lit("order").as("src_type"), lit("SUPPLIED_BY").as("rel"),
          lit("supplier").as("dst_type"), col("n_l").as("n_edges")))).as("s"))
      .select(col("s.src_type").as("src_type"), col("s.rel").as("rel"),
        col("s.dst_type").as("dst_type"), col("s.n_edges").as("n_edges"))
  }

  val schemaSql: String =
    s"""WITH e AS ($edgesSql),
       |t AS (SELECT
       |  CASE WHEN src < $OrderBase THEN 'customer' WHEN src < $PartBase THEN 'order'
       |       WHEN src < $SuppBase THEN 'part' ELSE 'supplier' END AS src_type,
       |  rel,
       |  CASE WHEN dst < $OrderBase THEN 'customer' WHEN dst < $PartBase THEN 'order'
       |       WHEN dst < $SuppBase THEN 'part' ELSE 'supplier' END AS dst_type
       |FROM e)
       |SELECT src_type, rel, dst_type, COUNT(*) AS n_edges FROM t GROUP BY 1, 2, 3""".stripMargin

  /** In/out degree per node (get_node_degree analog): two groupBys + one
    * full-outer merge — no row ever holds more than a counter. */
  def degrees(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val e = edges(orders, lineitem)
    val outD = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inD  = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    outD.join(inD, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  val degreesSql: String =
    s"""WITH e AS ($edgesSql),
       |o AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY src),
       |i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM e GROUP BY dst)
       |SELECT COALESCE(o.node, i.node) AS node,
       |       COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
       |FROM o FULL OUTER JOIN i ON o.node = i.node""".stripMargin

  /** k-hop expansion (find_connected_nodes analog) from rich customers
    * (c_acctbal > 9000): iterative frontier joins with per-hop distinct.
    * Fully generic loop — works for any k; each hop is one join + distinct. */
  def khop(customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: Int = 2): DataFrame = {
    // persisted co-partitioned edge set: every hop joins on src, so the
    // edge union is derived and shuffled ONCE (it was previously re-derived
    // per hop); the frontier is the small side → SHUFFLE_HASH build.
    // KhopProbe (SCALING.md r11) decomposed the 100× wall: ~2/3 is THIS
    // derive+distribute step, the BFS itself is ~1/3 — which is why the
    // production form below consumes a PERSISTED edge store instead.
    val eSrc = Iterative.build(edges(orders, lineitem)
      .select(col("src"), col("dst")).repartition(col("src")).persist())
    val seeds = customer.filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").cast("long").as("node"), lit(0L).as("hops"))
    try khopFrom(eSrc, seeds, k)
    finally eSrc.unpersist(blocking = false) // exception-safe, loop-only
  }

  /** Production-shaped core of [[khop]]: given the PERSISTED (at scale:
    * bucketed-by-src) edge store — derived once per corpus version and
    * shared by every graph query, not re-derived per call — run the BFS
    * itself. Each hop exchanges only the node-sized frontier; the edge
    * side is partition-local. `eSrc` should be hash-distributed on src
    * (persist keeps that partitioning in the plan; a checkpoint scan
    * would erase it — HitsPlanProbe). */
  def khopFrom(eSrc: DataFrame, seeds: DataFrame, k: Int = 2): DataFrame = {
    var all = seeds
    var frontier = seeds
    for (h <- 1 to k) {
      // materialize each level: without it the lineage re-derives every
      // earlier hop per downstream use (exponential recompute in iterative
      // DataFrame graph algorithms)
      frontier = frontier.hint("SHUFFLE_HASH").join(eSrc, col("node") === col("src"))
        .select(col("dst").as("node"), lit(h.toLong).as("hops"))
        .distinct().materialize
      all = all.unionAll(frontier)
    }
    all.groupBy("node").agg(min(col("hops")).as("hops"))
  }

  val khopSql: String =
    s"""WITH e AS ($edgesSql),
       |seeds AS (SELECT CAST(c_custkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS hops
       |          FROM customer WHERE c_acctbal > 9000),
       |h1 AS (SELECT DISTINCT e.dst AS node, CAST(1 AS BIGINT) AS hops
       |       FROM seeds JOIN e ON seeds.node = e.src),
       |h2 AS (SELECT DISTINCT e.dst AS node, CAST(2 AS BIGINT) AS hops
       |       FROM h1 JOIN e ON h1.node = e.src)
       |SELECT node, MIN(hops) AS hops FROM
       |(SELECT * FROM seeds UNION ALL SELECT * FROM h1 UNION ALL SELECT * FROM h2)
       |GROUP BY node""".stripMargin

  /** Undirected co-purchase edges between parts sharing a sampled order
    * (o_orderkey % 100 == 0 keeps the projection sparse enough for exact
    * BFS verification; at scale the sample rate is the knob). */
  private[graft] def copurchase(lineitem: DataFrame): DataFrame = {
    val li = lineitem.filter(pmod(col("l_orderkey"), lit(100L)) === 0L)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("a").join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
  }

  private val copurchaseSql: String = copurchaseSqlWhere("")

  private def copurchaseSqlWhere(extra: String): String =
    s"""SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |FROM lineitem a JOIN lineitem b
      |ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |WHERE a.l_orderkey % 100 = 0$extra""".stripMargin

  /** BFS shortest-path distances (find_shortest_path analog) from the
    * minimum part id in the co-purchase graph, capped depth. Iterative
    * DataFrame BFS: frontier ⋈ edges per level, min-dist dedup — log-depth
    * loop, every step fully distributed. */
  def shortestPaths(lineitem: DataFrame, maxDepth: Int = 3): DataFrame = {
    // materialize the projected edge set and every BFS level: iterative
    // DataFrame algorithms otherwise re-derive the whole lineage per level.
    // The per-level joins ride a persisted src-partitioned copy (checkpoint
    // scans erase partitioning — HitsPlanProbe) so each level exchanges
    // only the frontier, never the edge set.
    val cp = copurchase(lineitem).materialize
    val cpSrc = Iterative.build(cp.repartition(col("src")).persist())
    val start = cp.agg(min(col("src")).as("node"))
      .select(col("node"), lit(0L).as("dist"))
    var all = start
    var frontier = start
    try {
    for (d <- 1 to maxDepth) {
      frontier = frontier.hint("SHUFFLE_HASH").join(cpSrc, col("node") === col("src"))
        .select(col("dst").as("node"), lit(d.toLong).as("dist"))
        .distinct()
        .join(all.select(col("node").as("seen")), col("node") === col("seen"), "left_anti").materialize
      all = all.unionAll(frontier)
    }
    all.groupBy("node").agg(min(col("dist")).as("dist"))
    } finally cpSrc.unpersist(blocking = false) // exception-safe, loop-only
  }

  /** BFS shortest paths WITH path reconstruction (graph_service.py:268
    * `find_shortest_path` returns the node path, not just the distance):
    * the frontier carries the path string; when several predecessors reach
    * a node in the same level, the path of the MINIMUM predecessor id wins
    * (`min_by`) — a deterministic tie-break both engines implement, so the
    * whole path column is hash-comparable. Same per-level materialized
    * loop as shortestPaths; the extra state per frontier row is one
    * bounded string (≤ maxDepth ids). */
  def shortestPathTrace(lineitem: DataFrame, maxDepth: Int = 3): DataFrame = {
    val cp = copurchase(lineitem).materialize
    val cpSrc = Iterative.build(cp.repartition(col("src")).persist()) // see shortestPaths
    val start = cp.agg(min(col("src")).as("node"))
      .select(col("node"), lit(0L).as("dist"), col("node").cast("string").as("path"))
    var all = start
    var frontier = start
    try {
    for (d <- 1 to maxDepth) {
      frontier = frontier.hint("SHUFFLE_HASH").join(cpSrc, col("node") === col("src"))
        .select(col("dst"), col("node").as("pred"),
          concat(col("path"), lit("->"), col("dst").cast("string")).as("npath"))
        .join(all.select(col("node").as("seen")), col("dst") === col("seen"), "left_anti")
        .groupBy(col("dst")).agg(min_by(col("npath"), col("pred")).as("path"))
        .select(col("dst").as("node"), lit(d.toLong).as("dist"), col("path")).materialize
      all = all.unionAll(frontier)
    }
    all
    } finally cpSrc.unpersist(blocking = false) // exception-safe, loop-only
  }

  def shortestPathTraceSql(maxDepth: Int = 3): String = {
    require(maxDepth == 3, "oracle is written for depth 3")
    s"""WITH cp AS ($copurchaseSql),
       |s0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist,
       |       CAST(MIN(src) AS VARCHAR) AS path FROM cp),
       |s1 AS (SELECT cp.dst AS node, CAST(1 AS BIGINT) AS dist,
       |       arg_min(s0.path || '->' || cp.dst, s0.node) AS path
       |       FROM s0 JOIN cp ON s0.node = cp.src
       |       WHERE cp.dst NOT IN (SELECT node FROM s0) GROUP BY cp.dst),
       |s2 AS (SELECT cp.dst AS node, CAST(2 AS BIGINT) AS dist,
       |       arg_min(s1.path || '->' || cp.dst, s1.node) AS path
       |       FROM s1 JOIN cp ON s1.node = cp.src
       |       WHERE cp.dst NOT IN (SELECT node FROM s0 UNION ALL SELECT node FROM s1)
       |       GROUP BY cp.dst),
       |s3 AS (SELECT cp.dst AS node, CAST(3 AS BIGINT) AS dist,
       |       arg_min(s2.path || '->' || cp.dst, s2.node) AS path
       |       FROM s2 JOIN cp ON s2.node = cp.src
       |       WHERE cp.dst NOT IN (SELECT node FROM s0 UNION ALL SELECT node FROM s1
       |                            UNION ALL SELECT node FROM s2)
       |       GROUP BY cp.dst)
       |SELECT node, dist, path FROM
       |(SELECT * FROM s0 UNION ALL SELECT * FROM s1
       | UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)""".stripMargin
  }

  /** find_nodes_by_label analog (graph_service.py:248): distinct node ids
    * of one label, recovered from the id-namespace encoding. */
  def nodesByLabel(orders: DataFrame, lineitem: DataFrame, label: String = "order"): DataFrame = {
    def typeOf(c: org.apache.spark.sql.Column) =
      when(c < OrderBase, "customer")
        .when(c < PartBase, "order")
        .when(c < SuppBase, "part")
        .otherwise("supplier")
    val e = edges(orders, lineitem)
    e.select(col("src").as("node")).unionAll(e.select(col("dst").as("node")))
      .distinct()
      .filter(typeOf(col("node")) === label)
      .select(col("node"), lit(label).as("label"))
  }

  def nodesByLabelSql(label: String = "order"): String =
    s"""WITH e AS ($edgesSql),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
       |SELECT node, '$label' AS label FROM n
       |WHERE CASE WHEN node < $OrderBase THEN 'customer' WHEN node < $PartBase THEN 'order'
       |           WHEN node < $SuppBase THEN 'part' ELSE 'supplier' END = '$label'""".stripMargin

  /** find_relationships_by_type analog (graph_service.py:254): all edges of
    * one relationship type. */
  def relsByType(orders: DataFrame, lineitem: DataFrame, rel: String = "PLACED"): DataFrame =
    edges(orders, lineitem).filter(col("rel") === rel)

  def relsByTypeSql(rel: String = "PLACED"): String =
    s"""WITH e AS ($edgesSql)
       |SELECT src, dst, rel FROM e WHERE rel = '$rel'""".stripMargin

  /** Harmonic closeness centrality (GDS closeness analog), bounded depth —
    * h(s) = Σ_{v≠s, d(s,v)≤D} 1/d(s,v), the centrality behind "which node
    * reaches the graph fastest". Exact all-pairs closeness is O(V·E) and
    * nobody runs it at 100 TB; the production form is (a) seed-sampled and
    * (b) depth-bounded, both of which this operator is: seeds are the
    * deterministic node sample (node % seedMod = 0), and the multi-source
    * BFS carries (seed, node) pairs through `maxDepth` join rounds — one
    * shuffle per level, frontier bounded by seeds × depth-D neighborhood.
    * With d ∈ {1,2,3} the harmonic sum stays in the integers as
    * 6·h = 6·n1 + 3·n2 + 2·n3 (LCM trick) — no float division anywhere,
    * so the DuckDB 3-level replay hash-matches exactly.
    *
    * Seed sampling assumes NON-NEGATIVE node ids: the Scala side uses
    * `pmod` (always ≥ 0) while the DuckDB oracle uses `%` (sign of the
    * dividend); the two agree only for ids ≥ 0, which holds because
    * co-purchase nodes are positive partkeys. */
  def closeness(lineitem: DataFrame, seedMod: Long = 20L): DataFrame = {
    require(seedMod > 0L, s"seedMod must be positive: $seedMod")
    val cp = copurchase(lineitem).materialize
    val cpSrc = Iterative.build(cp.repartition(col("src")).persist()) // see shortestPaths
    val seeds = cp.select(col("src").as("s")).distinct()
      .filter(pmod(col("s"), lit(seedMod)) === 0L)
    var all = seeds.select(col("s"), col("s").as("node"), lit(0L).as("dist"))
    var frontier = all
    try {
    for (d <- 1 to 3) {
      frontier = frontier.hint("SHUFFLE_HASH").as("f")
        .join(cpSrc.as("e"), col("f.node") === col("e.src"))
        .select(col("f.s").as("s"), col("e.dst").as("node"), lit(d.toLong).as("dist"))
        .distinct()
        .join(all.select(col("s").as("s2"), col("node").as("seen")),
          col("s") === col("s2") && col("node") === col("seen"), "left_anti")
        .materialize
      all = all.unionAll(frontier)
    }
    all.filter(col("dist") > 0L)
      .groupBy(col("s").as("node"))
      .agg(
        sum(when(col("dist") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("dist") === 2L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("dist") === 3L, 1L).otherwise(0L)).as("n3"))
      .withColumn("harmonic6", col("n1") * 6L + col("n2") * 3L + col("n3") * 2L)
    } finally cpSrc.unpersist(blocking = false) // exception-safe, loop-only
  }

  def closenessSql(seedMod: Long = 20L): String = {
    require(seedMod > 0L, s"seedMod must be positive: $seedMod")
    s"""WITH cp AS ($copurchaseSql),
       |l0 AS (SELECT DISTINCT src AS s, src AS node FROM cp WHERE src % $seedMod = 0),
       |l1 AS (
       |  SELECT DISTINCT l0.s, cp.dst AS node FROM l0 JOIN cp ON l0.node = cp.src
       |  EXCEPT SELECT s, node FROM l0),
       |l2 AS (
       |  SELECT DISTINCT l1.s, cp.dst AS node FROM l1 JOIN cp ON l1.node = cp.src
       |  EXCEPT (SELECT s, node FROM l0 UNION ALL SELECT s, node FROM l1)),
       |l3 AS (
       |  SELECT DISTINCT l2.s, cp.dst AS node FROM l2 JOIN cp ON l2.node = cp.src
       |  EXCEPT (SELECT s, node FROM l0 UNION ALL SELECT s, node FROM l1
       |          UNION ALL SELECT s, node FROM l2)),
       |lv AS (
       |  SELECT s, node, 1 AS dist FROM l1
       |  UNION ALL SELECT s, node, 2 FROM l2
       |  UNION ALL SELECT s, node, 3 FROM l3)
       |SELECT s AS node,
       |  CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |  CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |  CAST(SUM(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |  CAST(SUM(CASE WHEN dist = 1 THEN 6 WHEN dist = 2 THEN 3 ELSE 2 END) AS BIGINT)
       |    AS harmonic6
       |FROM lv GROUP BY 1""".stripMargin
  }

  /** Link prediction by common-neighbor count (the classic
    * Liben-Nowell/Kleinberg baseline; GDS linkPrediction analog): for node
    * pairs NOT already connected, count shared neighbors through a wedge
    * join on the shared endpoint, drop existing edges with an anti-join,
    * rank by score. Cost is Σ_x deg(x)² — the same wedge bound
    * graph_node_sim and triangles already live under; at scale the
    * standard mitigations apply (cap per-node neighbor lists, orient by
    * degree). Integer scores ⇒ hash-exact oracle. */
  def linkPredict(lineitem: DataFrame, topN: Int = 20): DataFrame = {
    val cp = copurchase(lineitem).materialize
    val pairs = cp.as("e1").join(cp.as("e2"),
        col("e1.dst") === col("e2.dst") && col("e1.src") < col("e2.src"))
      .groupBy(col("e1.src").as("node_a"), col("e2.src").as("node_b"))
      .agg(count(lit(1)).as("common_neighbors"))
    pairs.join(cp,
        pairs("node_a") === cp("src") && pairs("node_b") === cp("dst"), "left_anti")
      .orderBy(desc("common_neighbors"), col("node_a"), col("node_b"))
      .limit(topN)
  }

  def linkPredictSql(topN: Int = 20): String =
    s"""WITH cp AS ($copurchaseSql),
       |pairs AS (
       |  SELECT e1.src AS node_a, e2.src AS node_b, COUNT(*) AS common_neighbors
       |  FROM cp e1 JOIN cp e2 ON e1.dst = e2.dst AND e1.src < e2.src
       |  GROUP BY 1, 2)
       |SELECT p.node_a, p.node_b, p.common_neighbors
       |FROM pairs p
       |WHERE NOT EXISTS (SELECT 1 FROM cp WHERE p.node_a = cp.src AND p.node_b = cp.dst)
       |ORDER BY common_neighbors DESC, node_a, node_b LIMIT $topN""".stripMargin

  /** Degree-distribution histogram (the power-law sanity check every graph
    * pipeline plots): total degree per node over the typed edge table, then
    * node counts per degree value. Two map-combined aggregations, nothing
    * else. */
  def degreeDistribution(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val e = edges(orders, lineitem)
    e.select(col("src").as("node")).unionAll(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  val degreeDistributionSql: String =
    s"""WITH e AS ($edgesSql),
       |d AS (
       |  SELECT node, COUNT(*) AS degree FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
       |  GROUP BY node)
       |SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY degree""".stripMargin

  def shortestPathsSql(maxDepth: Int = 3): String =
    s"""WITH cp AS ($copurchaseSql),
       |s0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist FROM cp),
       |s1 AS (SELECT DISTINCT cp.dst AS node, CAST(1 AS BIGINT) AS dist FROM s0 JOIN cp ON s0.node = cp.src),
       |s2 AS (SELECT DISTINCT cp.dst AS node, CAST(2 AS BIGINT) AS dist FROM s1 JOIN cp ON s1.node = cp.src),
       |s3 AS (SELECT DISTINCT cp.dst AS node, CAST(3 AS BIGINT) AS dist FROM s2 JOIN cp ON s2.node = cp.src)
       |SELECT node, MIN(dist) AS dist FROM
       |(SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
       |GROUP BY node""".stripMargin

  /** Seed-sampled betweenness contributions (Brandes' algorithm, the one
    * classic centrality the degree/pagerank/hits family doesn't cover):
    * for each seed in the deterministic sample (node % seedMod = 0 — the
    * same sampling contract as [[closeness]]), a forward BFS accumulates
    * shortest-path counts σ level by level (exact-integer sums), then the
    * backward pass folds dependencies δ(v) = Σ_w (σ_v/σ_w)(1+δ_w) from
    * the deepest level up. Every seed is an independent run — the frames
    * carry (seed, node) pairs so ALL seeds advance through the same
    * per-level join (multi-source, embarrassingly parallel, exactly how
    * sampled betweenness runs at 100 TB; exact all-sources Brandes is
    * O(V·E) and nobody runs it at scale).
    *
    * Determinism: σ is integer throughout; each δ rollup sums its terms as
    * DECIMAL(38,18) via the string cast (order-independent) and re-enters
    * double through the string cast — the replayable-iteration recipe
    * (pageRank/HITS precedent). Every level is one frontier⋈edges join +
    * grouped sum — log-depth loop, fully distributed.
    *
    * Seed sampling shares [[closeness]]'s non-negative-id assumption:
    * Scala `pmod` vs oracle `%` agree only for ids ≥ 0 (positive
    * partkeys here). */
  def betweenness(lineitem: DataFrame, maxDepth: Int = 3, seedMod: Long = 50L): DataFrame = {
    require(seedMod > 0L, s"seedMod must be positive: $seedMod")
    val cp = copurchase(lineitem).materialize
    val cpSrc = Iterative.build(cp.repartition(col("src")).persist()) // see shortestPaths
    val s0 = cp.select(col("src")).distinct()
      .filter(pmod(col("src"), lit(seedMod)) === 0L)
      .select(col("src").as("seed"), col("src").as("node"), lit(1L).as("sigma")).materialize
    val levels = scala.collection.mutable.ArrayBuffer(s0)
    var seen = s0.select(col("seed"), col("node"))
    try {
    for (_ <- 1 to maxDepth) {
      val next = levels.last.hint("SHUFFLE_HASH").join(cpSrc, col("node") === col("src"))
        .join(seen.select(col("seed").as("s2"), col("node").as("sn")),
          col("seed") === col("s2") && col("dst") === col("sn"), "left_anti")
        .groupBy(col("seed"), col("dst"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("seed"), col("dst").as("node"), col("sigma")).materialize
      levels += next
      val nseen = seen.unionAll(next.select(col("seed"), col("node"))).materialize
      // seen is forward-pass-only scratch (levels carry the state the
      // backward pass reads) — free the superseded accumulation
      release(seen)
      seen = nseen
    }
    var delta = levels(maxDepth).select(col("seed"), col("node"), col("sigma"), lit(0.0).as("delta"))
    var out = delta.select(col("seed"), col("node"), lit(maxDepth.toLong).as("dist"),
      col("sigma"), col("delta"))
    for (d <- maxDepth - 1 to 1 by -1) {
      val cur = levels(d)
      val contrib = cur.hint("SHUFFLE_HASH").join(cpSrc, col("node") === col("src"))
        .join(delta.select(col("seed").as("ws"), col("node").as("w"),
            col("sigma").as("sw"), col("delta").as("dw")),
          col("seed") === col("ws") && col("dst") === col("w"))
        .select(col("seed"), col("node"),
          ((col("sigma").cast("double") / col("sw").cast("double"))
            * (lit(1.0) + col("dw"))).as("term"))
        .groupBy(col("seed"), col("node"))
        .agg(sum(col("term").cast("string").cast("decimal(38,18)")).as("dsum"))
        .select(col("seed"), col("node"), col("dsum").cast("string").cast("double").as("dd"))
      delta = cur.join(contrib, Seq("seed", "node"), "left")
        .select(col("seed"), col("node"), col("sigma"), coalesce(col("dd"), lit(0.0)).as("delta"))
        .materialize
      out = out.unionAll(delta.select(col("seed"), col("node"), lit(d.toLong).as("dist"),
        col("sigma"), col("delta")))
    }
    // out references only the materialized delta frames plus
    // levels(maxDepth) (through the initial delta projection): the final
    // seen accumulation and levels(0..maxDepth-1) — s0 included — are
    // scratch once the backward pass has materialized its deltas
    release(seen)
    for (d <- 0 until maxDepth) release(levels(d))
    out
    } finally cpSrc.unpersist(blocking = false) // exception-safe, loop-only
  }

  def betweennessSql(maxDepth: Int = 3, seedMod: Long = 50L): String = {
    require(maxDepth == 3, "oracle replay is spelled for depth 3")
    require(seedMod > 0L, s"seedMod must be positive: $seedMod")
    val term = "CAST(CAST((CAST(v.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE)) * (1.0 + w.delta) AS VARCHAR) AS DECIMAL(38,18))"
    s"""WITH cp AS ($copurchaseSql),
       |s0 AS (SELECT DISTINCT src AS seed, src AS node, CAST(1 AS BIGINT) AS sigma
       |       FROM cp WHERE src % $seedMod = 0),
       |l1 AS (
       |  SELECT s0.seed, cp.dst AS node, CAST(SUM(s0.sigma) AS BIGINT) AS sigma
       |  FROM s0 JOIN cp ON s0.node = cp.src
       |  WHERE NOT EXISTS (SELECT 1 FROM s0 x
       |                    WHERE x.seed = s0.seed AND x.node = cp.dst)
       |  GROUP BY s0.seed, cp.dst),
       |l2 AS (
       |  SELECT l1.seed, cp.dst AS node, CAST(SUM(l1.sigma) AS BIGINT) AS sigma
       |  FROM l1 JOIN cp ON l1.node = cp.src
       |  WHERE NOT EXISTS (SELECT 1 FROM (SELECT seed, node FROM s0
       |                                    UNION ALL SELECT seed, node FROM l1) x
       |                    WHERE x.seed = l1.seed AND x.node = cp.dst)
       |  GROUP BY l1.seed, cp.dst),
       |l3 AS (
       |  SELECT l2.seed, cp.dst AS node, CAST(SUM(l2.sigma) AS BIGINT) AS sigma
       |  FROM l2 JOIN cp ON l2.node = cp.src
       |  WHERE NOT EXISTS (SELECT 1 FROM (SELECT seed, node FROM s0
       |                                    UNION ALL SELECT seed, node FROM l1
       |                                    UNION ALL SELECT seed, node FROM l2) x
       |                    WHERE x.seed = l2.seed AND x.node = cp.dst)
       |  GROUP BY l2.seed, cp.dst),
       |d3 AS (SELECT seed, node, sigma, 0.0 AS delta FROM l3),
       |c2 AS (
       |  SELECT v.seed, v.node, SUM($term) AS dsum
       |  FROM l2 v JOIN cp ON cp.src = v.node
       |  JOIN d3 w ON w.seed = v.seed AND w.node = cp.dst
       |  GROUP BY v.seed, v.node),
       |d2 AS (
       |  SELECT l2.seed, l2.node, l2.sigma,
       |    COALESCE(CAST(CAST(c2.dsum AS VARCHAR) AS DOUBLE), 0.0) AS delta
       |  FROM l2 LEFT JOIN c2 ON c2.seed = l2.seed AND c2.node = l2.node),
       |c1 AS (
       |  SELECT v.seed, v.node, SUM($term) AS dsum
       |  FROM l1 v JOIN cp ON cp.src = v.node
       |  JOIN d2 w ON w.seed = v.seed AND w.node = cp.dst
       |  GROUP BY v.seed, v.node),
       |d1 AS (
       |  SELECT l1.seed, l1.node, l1.sigma,
       |    COALESCE(CAST(CAST(c1.dsum AS VARCHAR) AS DOUBLE), 0.0) AS delta
       |  FROM l1 LEFT JOIN c1 ON c1.seed = l1.seed AND c1.node = l1.node)
       |SELECT seed, node, CAST(3 AS BIGINT) AS dist, sigma, delta FROM d3
       |UNION ALL SELECT seed, node, CAST(2 AS BIGINT) AS dist, sigma, delta FROM d2
       |UNION ALL SELECT seed, node, CAST(1 AS BIGINT) AS dist, sigma, delta FROM d1""".stripMargin
  }

  /** Connected components over the sampled co-purchase graph: iterative
    * min-label propagation (each round every node takes the min label in
    * its neighborhood; converges in diameter rounds). Per-round
    * materialization; early-exits when a round changes nothing. rows-only
    * (spec asserts edge-consistency of labels). */
  // maxIters 30: the sf0.1 co-purchase graph needs >10 compression rounds
  // to reach the fixed point (plain propagation depth 22); early exit makes
  // converged runs pay only their actual round count
  def connectedComponents(lineitem: DataFrame, maxIters: Int = 30): DataFrame =
    labelPropagation(copurchase(lineitem), maxIters)

  /** Incremental connected-components maintenance — the GRAPH-side member
    * of the index-maintenance family (ivf_upsert / minhash_lsh_upsert /
    * bm25_upsert; ⇐ the reference's entity upsert into Neo4j IS
    * incremental graph maintenance, neo4j_knowledge_service.py
    * upsert_entity). An arrival batch of orders (delta = l_orderkey%1000
    * == 0, a tenth of the sampled co-purchase orders) only ADDS
    * within-order part edges, so the standing (node → component) labeling
    * is maintained without touching the base edge set: look up the delta
    * endpoints' standing labels (new nodes label themselves), run
    * components over the TINY label graph the delta edges induce (its
    * nodes are touched component labels — O(Δ), never O(graph)), and
    * relabel only the merged groups through one broadcast mapping join.
    * Canonical min-id labels survive the merge: a merged group's new
    * label is the min over its member labels, which is exactly the min
    * node id of the merged component.
    *
    * The oracle is componentsSql() VERBATIM — the full-graph recompute —
    * so the hash gate proves incremental maintenance lossless the same
    * way the stream family states stream ≡ batch.
    *
    * Contract: edge ADDITIONS only (the monotone direction — components
    * only merge). Deletions can split a component and are not additively
    * maintainable; the standard answer at scale is recompute-on-delete or
    * per-component recompute scoped by the deleted edge's label. */
  def componentsUpsert(lineitem: DataFrame, maxIters: Int = 30): DataFrame = {
    val isDeltaOrder = pmod(col("l_orderkey"), lit(1000L)) === 0L
    // standing labeling over the already-ingested graph (persisted table
    // in production — componentsUpsertFrom consumes it as-is)
    val labelsBase = connectedComponents(lineitem.filter(!isDeltaOrder), maxIters)
    componentsUpsertFrom(labelsBase, copurchase(lineitem.filter(isDeltaOrder)),
      maxIters)
  }

  /** Production-shaped core of [[componentsUpsert]]: given the PERSISTED
    * standing labeling and an arrival batch's edge set, emit the
    * maintained full labeling. Cost at scale: one delta-sized lookup join
    * against the labeling, a label-graph CC bounded by touched components,
    * and one broadcast-mapping relabel pass — never an O(graph) edge
    * traversal. */
  def componentsUpsertFrom(labelsBase: DataFrame, deltaEdges: DataFrame,
                           maxIters: Int = 30): DataFrame = {
    val (mapping, newNodes) = upsertMergeMapping(labelsBase, deltaEdges, maxIters)
    // relabel: standing rows plus the batch's brand-new nodes; only labels
    // in a merged group rewrite (broadcast — the mapping is delta-bounded).
    // relabel each side BEFORE unioning: a join ABOVE the union pushes its
    // constraints into Spark 4.1's UnionBase.rewriteConstraints, which
    // throws NoSuchElementException when a child constraint references a
    // pre-union attribute; with the union last, nothing rewrites into it
    def relabel(side: DataFrame): DataFrame = side
      .join(broadcast(mapping), col("label") === col("old_label"), "left_outer")
      .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
    relabel(labelsBase).unionByName(relabel(newNodes))
  }

  /** The CHANGED-ROW delta of [[componentsUpsertFrom]] — what a write-back
    * cycle actually needs to PERSIST: the batch's brand-new nodes plus the
    * standing nodes whose label rewrites under the merge mapping. The
    * standing scan is one broadcast join over the node-bucketed labeling
    * (no exchange, rows out = O(touched components)); the WRITE is O(Δ)
    * where persisting the full maintained labeling is O(graph).
    * Identity: componentsUpsertFrom(base, e) ≡
    * base ∖ (delta's nodes) ∪ componentsUpsertDelta(base, e) — the
    * DeltaStore.merged contract, pinned by ComponentsSpec. */
  def componentsUpsertDelta(labelsBase: DataFrame, deltaEdges: DataFrame,
                            maxIters: Int = 30): DataFrame = {
    val (mapping, newNodes) = upsertMergeMapping(labelsBase, deltaEdges, maxIters)
    // only genuinely-rewriting labels (old ≠ new) mark a base row changed
    val changing = mapping.filter(col("old_label") =!= col("new_label"))
    val changedBase = labelsBase
      .join(broadcast(changing), col("label") === col("old_label"))
      .select(col("node"), col("new_label").as("label"))
    val newRelabel = newNodes
      .join(broadcast(mapping), col("label") === col("old_label"), "left_outer")
      .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
    changedBase.unionByName(newRelabel)
  }

  /** Shared derivation of the upsert merge: the delta-bounded label→label
    * mapping plus the batch's brand-new nodes (with their pre-merge
    * labels). */
  private def upsertMergeMapping(labelsBase: DataFrame, deltaEdges: DataFrame,
                                 maxIters: Int): (DataFrame, DataFrame) = {
    // endpoints via explode, not a self-union: a Union of two aliased
    // projections of the same source trips Spark 4.1's
    // UnionBase.rewriteConstraints once join constraints push into it
    // (NoSuchElementException on the pre-alias attribute)
    val ends = deltaEdges
      .select(explode(array(col("src"), col("dst"))).as("node")).distinct()
    // standing label per delta endpoint; a node the index has never seen
    // starts as its own singleton component
    val endLab = ends.join(labelsBase.withColumnRenamed("label", "base_label"),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("base_label"), col("node")).as("label"))
    // label graph: one node per TOUCHED component label, one edge per
    // delta edge that bridges two labels — O(Δ) by construction
    val la = endLab.select(col("node").as("src"), col("label").as("la"))
    val lb = endLab.select(col("node").as("dst"), col("label").as("lb"))
    val labelEdges = deltaEdges.join(la, "src").join(lb, "dst")
      .filter(col("la") =!= col("lb"))
      .select(col("la").as("src"), col("lb").as("dst")).distinct()
    val mapping = labelPropagation(labelEdges, maxIters)
      .select(col("node").as("old_label"), col("label").as("new_label"))
    val newNodes = endLab.join(labelsBase.select(col("node")), Seq("node"), "left_anti")
    (mapping, newNodes)
  }

  /** DELETE direction of connected-components maintenance — the
    * per-component-scoped recompute the upsert contract documents (edge
    * deletions can SPLIT a component, so they are not additively
    * maintainable; the standard answer is recompute scoped by the deleted
    * edges' labels). Reference analog: graph_service.py:241 delete_node —
    * Neo4j maintains graph structure through node/relationship deletes.
    *
    * A departure batch of orders (delta = l_orderkey%1000 == 0) removes
    * its within-order part edges. Only components TOUCHED by a deleted
    * edge can change, and no surviving edge leaves an original component
    * (components only split under deletion) — so the recompute runs CC on
    * exactly the touched components' surviving subgraph: O(touched), never
    * O(graph). Untouched rows of the standing labeling pass through; a
    * touched-component node that lost all its edges drops out (matching
    * the full recompute, whose node set is edge-incident nodes). Min-id
    * labels re-canonicalize per split part for free — labelPropagation
    * returns the min reachable node id, exactly what the from-scratch
    * labeling assigns.
    *
    * The oracle is the componentsSql full recompute over the POST-DELETE
    * graph, so the hash gate proves the scoped recompute equals the
    * global one. */
  def componentsDelete(lineitem: DataFrame, maxIters: Int = 30): DataFrame = {
    val isDelOrder = pmod(col("l_orderkey"), lit(1000L)) === 0L
    // r16 (verdict item 3): ONE full labeling pass instead of two. The
    // pre-r16 gate form ran connectedComponents over the FULL graph (the
    // standing labeling, in-call for oracle coverage) and then
    // componentsDeleteFrom's touched-scope recompute — which at gate SFs
    // touches the giant component, i.e. a second full pass. Both needs are
    // now fed from the SURVIVING graph's labeling, materialized once:
    //   - the standing labeling is derived through the upsert identity
    //     (CC(surviving ∪ deleted) ≡ componentsUpsertFrom(CC(surviving),
    //     deleted edges) — the graph_components_inc gate's proven
    //     identity; the deleted orders' edges are additions relative to
    //     the surviving graph, and copurchase(all) = copurchase(surviving)
    //     ∪ copurchase(deleted) since every within-order pair comes from a
    //     surviving or a deleted order) — O(Δ) label-graph work;
    //   - the touched-scope recompute is the surviving labeling BY
    //     RESTRICTION: the touched components' surviving subgraph is a
    //     union of whole surviving-graph components (an edge's endpoints
    //     share a component), so labelPropagation over it returns exactly
    //     the surviving labeling's rows for touched nodes, and a touched
    //     node with no surviving edge is absent from both.
    // The merge below is componentsDeleteFrom's single-pass merge with
    // relab := the surviving labeling. The production shape (persisted
    // standing labeling + genuinely scoped recompute) is unchanged in
    // componentsDeleteFrom — the _store twin still runs it.
    val survEdges = copurchase(lineitem.filter(!isDelOrder))
    val delEdges = copurchase(lineitem.filter(isDelOrder))
    val labelsSurv = labelPropagation(survEdges, maxIters)
    val labelsBase = componentsUpsertFrom(labelsSurv, delEdges, maxIters)
    val delNodes = delEdges
      .select(explode(array(col("src"), col("dst"))).as("node")).distinct()
    val touched = delNodes.join(labelsBase, "node").select(col("label")).distinct()
    labelsBase
      .join(broadcast(touched.withColumn("touched", lit(true))),
        Seq("label"), "left_outer")
      .join(labelsSurv.withColumnRenamed("label", "new_label"),
        Seq("node"), "left_outer")
      .filter(col("touched").isNull || col("new_label").isNotNull)
      .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
  }

  /** Production-shaped core of [[componentsDelete]]: given the PERSISTED
    * standing labeling, the maintained post-delete edge store (an edge
    * survives iff a surviving order still generates it — the store owns
    * that multiplicity), and the deleted orders' edge set, emit the
    * maintained full labeling. Cost at scale: one delta-sized label
    * lookup, one broadcast semi/anti split of the labeling, CC over the
    * touched components' subgraph only. */
  def componentsDeleteFrom(labelsBase: DataFrame, survivingEdges: DataFrame,
                           delEdges: DataFrame, maxIters: Int = 30): DataFrame = {
    // component labels touched by a deleted edge — delta-bounded, broadcast
    val delNodes = delEdges
      .select(explode(array(col("src"), col("dst"))).as("node")).distinct()
    val touched = delNodes.join(labelsBase, "node").select(col("label")).distinct()
    // surviving subgraph of the touched components: src-side semi-join is
    // enough — an edge's endpoints share a component, so dst follows
    val touchedNodes = labelsBase.join(broadcast(touched), Seq("label"), "left_semi")
      .select(col("node").as("src"))
    val subEdges = survivingEdges.join(touchedNodes, Seq("src"), "left_semi")
    // scoped recompute, merged back WITHOUT a Union: Spark 4.1's
    // UnionBase.rewriteConstraints throws when anything above a Union
    // (including localCheckpoint's own execution) pushes constraints into
    // children that share the labelsBase lineage — so the merge is one
    // pass over the standing labeling instead: untouched rows keep their
    // label, touched rows take their recomputed label, touched rows the
    // recompute no longer covers (all edges gone) drop out. relab is
    // touched-bounded and materialized (labelPropagation checkpoints its
    // result), so the node-keyed join is against a small clean scan.
    val relab = labelPropagation(subEdges, maxIters)
      .withColumnRenamed("label", "new_label")
    labelsBase
      .join(broadcast(touched.withColumn("touched", lit(true))),
        Seq("label"), "left_outer")
      .join(relab, Seq("node"), "left_outer")
      .filter(col("touched").isNull || col("new_label").isNotNull)
      .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
  }

  /** Probe-only: the round-1 propagate frame of [[labelPropagation]],
    * UNEXECUTED — the loop body's plan for the PlanSnap before/after
    * artifacts (the loop itself checkpoints eagerly, so the registered
    * query's lazy plan is just a checkpoint scan). Mirrors the loop body
    * verbatim; labels0 = every node its own label. */
  private[graft] def labelPropRoundProbe(edgeTable: DataFrame): DataFrame = {
    val edges = edgeTable.select(col("src"), col("dst"))
    val labels = selfLoopedSym(edges).filter(col("self"))
      .select(col("src").as("node"))
      .withColumn("label", col("node"))
    propagateOnce(selfLoopedSym(edges), labels)
  }

  /** Probe-only: ONE PageRank iteration's update frame over the
    * pre-partitioned persisted edge copy, UNEXECUTED — the loop-body plan
    * artifact (plans/r16) + the RankPlanSpec pin that the edge side stays
    * exchange-free and the rank-vector joins stay SHUFFLE_HASH under the
    * checkpoint stats cap. Mirrors [[pageRankFrom]]'s loop body verbatim
    * (round ≥ 1 shape: ranks is a checkpoint scan). */
  private[graft] def pageRankRoundProbe(edgeTable: DataFrame): DataFrame = {
    import Iterative._
    val edges = edgeTable.select(col("src"), col("dst")).materialize
    val nodes = edges.select(col("src").as("node")).distinct().materialize
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).materialize
    val eSrc = Iterative.build(edges.repartition(col("src")).persist())
    val ranks = nodes.select(col("node"), lit(1.0 / 1000.0).as("rank")).materialize
    val contribs = eSrc
      .join(ranks.hint("SHUFFLE_HASH"), col("src") === col("node"))
      .join(outDeg.hint("SHUFFLE_HASH"), "src")
      .select(col("dst"), (col("rank") / col("deg")).as("c"))
      .groupBy(col("dst"))
      .agg(sum(col("c").cast("string").cast("decimal(38,18)")).cast("double").as("inflow"))
    nodes.join(contribs, col("node") === col("dst"), "left_outer")
      .select(col("node"),
        (lit(0.15 / 1000.0) + lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("rank"))
  }

  /** Probe-only: ONE HITS round (auth half-round + hub half-round, raw,
    * pre-normalization) over the two per-key persisted edge copies,
    * UNEXECUTED — the hitsFrom loop-body plan artifact, same purpose as
    * [[pageRankRoundProbe]]. */
  private[graft] def hitsRoundProbe(e0: DataFrame): DataFrame = {
    import Iterative._
    def dec(c: org.apache.spark.sql.Column) = c.cast("string").cast("decimal(38,18)")
    val eBySrc = e0.repartition(col("src")).persist()
    val eByDst = Iterative.build(eBySrc.repartition(col("dst")).persist())
    val hub = eBySrc.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0).as("hub")).materialize
    val hubD = hub.select(col("node"), dec(col("hub")).as("d"))
    val authRaw = eBySrc.join(hubD.hint("SHUFFLE_HASH"), col("src") === col("node"))
      .groupBy(col("dst")).agg(sum(col("d")).cast("string").cast("double").as("raw"))
    val authD = authRaw.select(col("dst").as("node"), dec(col("raw")).as("d"))
    eByDst.join(authD.hint("SHUFFLE_HASH"), col("dst") === col("node"))
      .groupBy(col("src")).agg(sum(col("d")).cast("string").cast("double").as("raw"))
  }

  /** The symmetrized edge set PLUS one `self` row per node — the frame
    * every propagate round joins. The self row carries the node's own
    * label through its own aggregation group, which (r15 optimization)
    * lets [[propagateOnce]] emit `(new_label, old_label)` straight from
    * the aggregate — the per-round label-update join (a node-sized
    * SortMergeJoin + Exchange in the committed before-plan) disappears,
    * and the node set is preserved without it (every node appears as its
    * own dst). */
  private def selfLoopedSym(edges: DataFrame): DataFrame = {
    val sym0 = edges.unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    sym0.select(col("src"), col("dst"), lit(false).as("self"))
      .unionAll(sym0.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst"), lit(true).as("self")))
  }

  /** One propagate step of [[labelPropagation]] — shared by the loop and
    * the PlanSnap probe so the committed plan artifact IS the loop body.
    * `sym` must be [[selfLoopedSym]]-shaped: exactly one self row per
    * node, so `old_label` (the min over the single self contribution) IS
    * the node's previous label and `chg` matches the pre-r15 spelling
    * `coalesce(nmin, label) < label` row for row. */
  private def propagateOnce(sym: DataFrame, labels: DataFrame): DataFrame =
    sym.join(labels.hint("SHUFFLE_HASH"), col("src") === col("node"))
      .groupBy(col("dst"))
      .agg(min(col("label")).as("new_label"),
        min(when(col("self"), col("label"))).as("old_label"))
      .select(col("dst").as("node"), col("new_label"),
        (col("new_label") < col("old_label")).as("chg"))

  /** Generic min-label propagation over ANY `(src, dst)` edge table —
    * reused by connectedComponents (co-purchase graph) and by dedup
    * cluster resolution (near-dup pair graph). Returns (node, label)
    * where label = min node id reachable (pointer-jumped, O(log d)
    * rounds). */
  def labelPropagation(edgeTable: DataFrame, maxIters: Int = 10): DataFrame = {
    val edges = edgeTable.select(col("src"), col("dst")).materialize
    // undirected: propagate both ways. Pre-partition on the join key ONCE:
    // every round joins labels against this same edge set on src, so a
    // PERSISTED hash-distributed copy lets all ~log(diameter) iterations
    // reuse the one edge shuffle instead of re-exchanging the full edge
    // set per round (the dominant per-round cost at scale). persist, NOT
    // materialize: a localCheckpoint scan reports UnknownPartitioning
    // (HitsPlanProbe) which silently resurrects the per-round exchange;
    // the SHUFFLE_HASH hint on the node-sized labels side keeps the
    // edge side sort-free as well.
    // built EAGERLY (Iterative.build): round 1 otherwise plans against the
    // unbuilt cache (UnknownPartitioning) and re-exchanges the edge set
    val sym = Iterative.build(
      selfLoopedSym(edges).repartition(col("src")).persist())
    var changed = 1L
    var it = 0
    // pointer jumping: follow label → label-of-label, halving chain depth
    // each jump (label propagation alone needs diameter rounds; with
    // compression convergence is O(log diameter)). label values are always
    // member ids, so the lookup always matches — left_outer + coalesce is
    // belt-and-braces, same values.
    def jump(cur: DataFrame): DataFrame = cur.as("a")
      .join(cur.select(col("node").as("ln"), col("label").as("ll")).as("b"),
        col("a.label") === col("b.ln"), "left_outer")
      .select(col("a.node").as("node"),
        least(col("a.label"), coalesce(col("ll"), col("a.label"))).as("label"))
    // labels0 = every node its own label — read off the persisted frame's
    // self rows (no second distinct over the edge set). Lazy: round 1's
    // propagate computes the filter inline, a single reference.
    var labels = sym.filter(col("self")).select(col("src").as("node"))
      .withColumn("label", col("node"))
    var prevRound: DataFrame = null
    try {
    while (changed > 0 && it < maxIters) {
      // carry the change flag through the update so convergence detection
      // is a cheap count on the materialized round, not a second join
      val propagated = propagateOnce(sym, labels).materialize
      changed = propagated.filter(col("chg")).count()
      val next =
        jump(propagated.select(col("node"), col("new_label").as("label"))).materialize
      // superseded checkpoints are unreferenced once the new round is
      // materialized — free their blocks instead of pinning O(rounds)
      // node-sized frames for the session
      release(prevRound); release(propagated)
      prevRound = next
      labels = next
      it += 1
    }
    // maxIters == 0: labels is still the lazy filter over loop-scoped
    // frames — pin it before the finally releases them
    if (prevRound == null) labels = labels.materialize
    // the returned plan scans only the final labels checkpoint — the edge
    // tables were loop-only; finally-scoped so a failed job can't pin them
    } finally { sym.unpersist(blocking = false); release(edges) }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connectedComponents exited at maxIters=$maxIters still " +
          s"changing ($changed label updates in the last round) — labels " +
          "may be inconsistent; raise maxIters")
    labels
  }

  /** PageRank over the sampled co-purchase graph: the canonical iterative
    * distributed graph computation. Each iteration is one join + one
    * aggregation (contributions = rank/out-degree flowing along edges),
    * materialized per level; dangling mass folds into the damping term.
    * Deterministic: decimal-free but order-independent (sum of identical
    * double contributions per node — grouped sums use the same partial
    * aggregation tree only within a run; we round to 10 dp for stability).
    * rows-only. */
  def pageRank(lineitem: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame =
    pageRankFrom(copurchase(lineitem), iters, damping)

  /** Production-shaped core of [[pageRank]]: iterates over an
    * ALREADY-DERIVED co-purchase edge set — the per-call lineitem
    * self-join + distinct is the caller's choice (inline derivation or the
    * persisted edge store's bucketed scan, Stores.cpEdgesAll). */
  def pageRankFrom(edgeTable: DataFrame, iters: Int = 5,
                   damping: Double = 0.85): DataFrame = {
    val edges = edgeTable.materialize
    val nodes = edges.select(col("src").as("node")).distinct().materialize
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).materialize
    // every iteration joins the edge set on src — persisted co-partition
    // (NOT checkpoint: its scan erases the partitioning, HitsPlanProbe)
    // so only the node-sized rank/deg sides move per round
    val eSrc = Iterative.build(edges.repartition(col("src")).persist())
    val nNodes = nodes.count().toDouble
    var ranks = nodes.select(col("node"), lit(1.0 / nNodes).as("rank"))
    try {
    for (_ <- 1 to iters) {
      // inflow summed as DECIMAL(38,18) over each contribution's shortest
      // double repr: exact and summation-order-independent, so every
      // iteration's rank vector is bit-identical across partitionings AND
      // replayable by the DuckDB oracle (same recipe as Cluster's Lloyd
      // update); a double sum here would drift with partition order
      val contribs = eSrc
        .join(ranks.hint("SHUFFLE_HASH"), col("src") === col("node"))
        .join(outDeg.hint("SHUFFLE_HASH"), "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast("string").cast("decimal(38,18)")).cast("double").as("inflow"))
      val next = nodes
        .join(contribs, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (lit((1.0 - damping) / nNodes) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank")).materialize
      // round-0 ranks is a Project over nodes (release is structurally a
      // no-op there); every later round is a superseded checkpoint
      release(ranks)
      ranks = next
    }
    ranks.select(col("node"), (col("rank") * nNodes).as("scaled_rank"))
    } finally {
      // exception-safe: the edge cache and loop-only checkpoints must not
      // outlive a failed job. Round-0 ranks IS a projection of nodes, so
      // only release the inputs once a real iteration has replaced it —
      // the returned plan then reads only the final rank checkpoint.
      eSrc.unpersist(blocking = false)
      if (iters >= 1) { release(edges); release(nodes); release(outDeg) }
    }
  }

  /** DuckDB oracle replaying the full damped iteration: the decimal-exact
    * inflow sums make every iteration's doubles bit-identical, so the
    * final ranks hash-match. (1.0 - 0.85) / n is computed with the same
    * operation order as the Spark literals. */
  def pageRankSql(iters: Int = 5, damping: Double = 0.85): String = {
    val steps = (1 to iters).map { i =>
      s"""c_$i AS (
         |  SELECT cp.dst,
         |    CAST(SUM(CAST(CAST(r.rank / d.deg AS VARCHAR) AS DECIMAL(38,18))) AS DOUBLE) AS inflow
         |  FROM cp JOIN r_${i - 1} r ON cp.src = r.node JOIN outdeg d ON cp.src = d.src
         |  GROUP BY cp.dst),
         |r_$i AS (
         |  SELECT n.node,
         |    ((CAST(1.0 AS DOUBLE) - CAST($damping AS DOUBLE)) / nn.n)
         |      + CAST($damping AS DOUBLE) * COALESCE(c.inflow, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM nodes n CROSS JOIN nn LEFT JOIN c_$i c ON n.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS ($copurchaseSql),
       |nodes AS (SELECT DISTINCT src AS node FROM cp),
       |outdeg AS (SELECT src, COUNT(*) AS deg FROM cp GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |r_0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT r.node, r.rank * nn.n AS scaled_rank FROM r_$iters r CROSS JOIN nn""".stripMargin
  }

  /** PERSONALIZED PageRank from a single source (the min part id — same
    * deterministic anchor as shortestPaths): teleport mass returns to the
    * SOURCE instead of spreading uniformly, so ranks measure proximity to
    * it — the "find nodes related to X" primitive behind the reference's
    * contextual retrieval, where global pageRank measures importance.
    * Identical per-iteration shape and decimal-exact inflow recipe as
    * pageRank; the only change is the teleport term (indicator · (1−d)). */
  def personalizedPageRank(lineitem: DataFrame, iters: Int = 5,
                           damping: Double = 0.85): DataFrame = {
    val edges = copurchase(lineitem).materialize
    val nodes = edges.select(col("src").as("node")).distinct().materialize
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).materialize
    // persisted co-partition, same reasoning as pageRank
    val eSrc = Iterative.build(edges.repartition(col("src")).persist())
    val srcRow = nodes.agg(min(col("node")).as("s"))
    var ranks = nodes.crossJoin(broadcast(srcRow))
      .select(col("node"),
        when(col("node") === col("s"), lit(1.0)).otherwise(lit(0.0)).as("rank"))
    try {
    for (_ <- 1 to iters) {
      val contribs = eSrc
        .join(ranks.hint("SHUFFLE_HASH"), col("src") === col("node"))
        .join(outDeg.hint("SHUFFLE_HASH"), "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast("string").cast("decimal(38,18)"))
          .cast("string").cast("double").as("inflow"))
      val next = nodes.crossJoin(broadcast(srcRow))
        .join(contribs, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (when(col("node") === col("s"), lit(1.0 - damping)).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .materialize
      release(ranks) // see pageRank: no-op on round 0, real on later rounds
      ranks = next
    }
    ranks.filter(col("rank") > 0.0).select(col("node"), col("rank"))
    } finally { // exception-safe, see pageRank
      eSrc.unpersist(blocking = false)
      if (iters >= 1) { release(edges); release(nodes); release(outDeg) }
    }
  }

  def personalizedPageRankSql(iters: Int = 5, damping: Double = 0.85): String = {
    val steps = (1 to iters).map { i =>
      s"""c_$i AS (
         |  SELECT cp.dst,
         |    CAST(CAST(SUM(CAST(CAST(r.rank / d.deg AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR)
         |      AS DOUBLE) AS inflow
         |  FROM cp JOIN r_${i - 1} r ON cp.src = r.node JOIN outdeg d ON cp.src = d.src
         |  WHERE r.rank <> 0 GROUP BY cp.dst),
         |r_$i AS (
         |  SELECT n.node,
         |    (CASE WHEN n.node = sw.s THEN CAST(${1.0 - damping} AS DOUBLE)
         |          ELSE CAST(0.0 AS DOUBLE) END)
         |      + CAST($damping AS DOUBLE) * COALESCE(c.inflow, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM nodes n CROSS JOIN sw LEFT JOIN c_$i c ON n.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS MATERIALIZED ($copurchaseSql),
       |nodes AS (SELECT DISTINCT src AS node FROM cp),
       |outdeg AS (SELECT src, COUNT(*) AS deg FROM cp GROUP BY 1),
       |sw AS (SELECT MIN(node) AS s FROM nodes),
       |r_0 AS (
       |  SELECT n.node, CASE WHEN n.node = sw.s THEN CAST(1.0 AS DOUBLE)
       |                      ELSE CAST(0.0 AS DOUBLE) END AS rank
       |  FROM nodes n CROSS JOIN sw),
       |$steps
       |SELECT node, rank FROM r_$iters WHERE rank > 0.0""".stripMargin
  }

  /** Impact analysis (graph_service.py:546): reverse dependencies of the
    * hottest part — orders containing it (depth 1) and customers who placed
    * those orders (depth 2), with depth-decayed scores. */
  def impactAnalysis(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val target = lineitem.agg(min(col("l_partkey")).as("target_pk"))
    val hit = lineitem.join(broadcast(target), col("l_partkey") === col("target_pk"))
      .select(col("l_orderkey")).distinct()
    val d1 = hit.select(
      lit("order").as("node_type"), col("l_orderkey").as("node_id"),
      lit("CONTAINS").as("relationship"), lit(1L).as("depth"), lit(1.0).as("score"))
    val d2 = hit.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey")).distinct()
      .select(
        lit("customer").as("node_type"), col("o_custkey").as("node_id"),
        lit("PLACED").as("relationship"), lit(2L).as("depth"), lit(0.7).as("score"))
    d1.unionAll(d2)
  }

  val impactAnalysisSql: String =
    """WITH t AS (SELECT MIN(l_partkey) AS target_pk FROM lineitem),
      |hit AS (SELECT DISTINCT l_orderkey FROM lineitem, t WHERE l_partkey = target_pk)
      |SELECT 'order' AS node_type, l_orderkey AS node_id, 'CONTAINS' AS relationship,
      |       CAST(1 AS BIGINT) AS depth, CAST(1.0 AS DOUBLE) AS score FROM hit
      |UNION ALL
      |SELECT 'customer', o_custkey, 'PLACED', CAST(2 AS BIGINT), CAST(0.7 AS DOUBLE)
      |FROM (SELECT DISTINCT o_custkey FROM hit JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  /** DuckDB oracle for connected components: plain min-label propagation
    * run for a fixed `rounds` budget — once every component has reached
    * its minimum label, further rounds are no-ops, so ANY converged
    * algorithm (including Spark's pointer-jumping variant) hash-matches.
    * Budget chosen empirically: the sampled co-purchase graph converges in
    * 11 rounds at sf0.01 and 22 at sf0.1; 24 leaves margin. If Spark ever
    * exits unconverged (it warns), the oracle may legitimately differ —
    * that is a real defect worth failing on. */
  def componentsSql(rounds: Int = 24): String =
    componentsSqlFrom(copurchaseSql, rounds)

  /** Oracle for [[componentsDelete]]: the componentsSql full recompute over
    * the post-delete co-purchase graph. */
  def componentsDeleteSql(rounds: Int = 24): String =
    componentsSqlFrom(copurchaseSqlWhere(" AND a.l_orderkey % 1000 <> 0"), rounds)

  private def componentsSqlFrom(cpSql: String, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""l_$i AS MATERIALIZED (
         |  SELECT l.node, LEAST(l.label, COALESCE(MIN(nl.label), l.label)) AS label
         |  FROM l_${i - 1} l
         |  LEFT JOIN cp e ON l.node = e.src
         |  LEFT JOIN l_${i - 1} nl ON e.dst = nl.node
         |  GROUP BY l.node, l.label)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS MATERIALIZED ($cpSql),
       |l_0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM cp),
       |$steps
       |SELECT node, label FROM l_$rounds""".stripMargin
  }

  /** Node similarity (the Neo4j GDS `nodeSimilarity` shape the reference's
    * graph stack exposes): Jaccard over the order-neighborhoods of two
    * parts in the bipartite order—part graph. Inverted-index formulation —
    * pairs sharing no order never materialize, so cost follows true
    * overlap, not |parts|²; the 1%-order sample bounds the test run and is
    * the production knob for approximate similarity. */
  def nodeSimilarity(lineitem: DataFrame, threshold: Double = 0.2): DataFrame = {
    val li = lineitem.filter(pmod(col("l_orderkey"), lit(100L)) === 0L)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val deg = li.groupBy(col("pk")).agg(count(lit(1)).as("d"))
    val withDeg = li.join(deg, "pk")
    withDeg.as("a").join(withDeg.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"),
        col("a.d").as("da"), col("b.d").as("db"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("da") + col("db") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("part_a"), col("part_b"), col("jaccard"))
  }

  def nodeSimilaritySql(threshold: Double = 0.2): String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem WHERE l_orderkey % 100 = 0),
       |deg AS (SELECT pk, COUNT(*) AS d FROM li GROUP BY pk),
       |wd AS (SELECT li.ok, li.pk, deg.d FROM li JOIN deg USING (pk)),
       |pairs AS (
       |  SELECT a.pk AS part_a, b.pk AS part_b, a.d AS da, b.d AS db,
       |         CAST(COUNT(*) AS BIGINT) AS c
       |  FROM wd a JOIN wd b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2, 3, 4)
       |SELECT part_a, part_b,
       |  CAST(c AS DOUBLE) / CAST(da + db - c AS DOUBLE) AS jaccard
       |FROM pairs
       |WHERE CAST(c AS DOUBLE) / CAST(da + db - c AS DOUBLE) >= $threshold""".stripMargin

  /** Triangle count over the co-purchase graph via degree-ordered edge
    * orientation ("compact-forward"): every undirected edge is directed
    * from its (degree, id)-smaller endpoint, which caps oriented
    * out-degree at O(√m) and so bounds the wedge join to O(m^1.5) — the
    * property that makes distributed triangle counting survive skewed
    * 100 TB graphs (a celebrity node never fans out its full
    * neighborhood²). Each triangle is counted exactly once, at its
    * orientation-minimal vertex. Emits (n_edges, n_wedges, n_triangles).
    */
  def triangles(lineitem: DataFrame): DataFrame = {
    val und = copurchase(lineitem).filter(col("src") < col("dst"))
    val deg = und.select(col("src").as("v")).unionAll(und.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val srcFirst = und
      .join(deg.select(col("v").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dd")), "dst")
      .withColumn("fwd",
        col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst")))
    val oriented = srcFirst.select(
      when(col("fwd"), col("src")).otherwise(col("dst")).as("u"),
      when(col("fwd"), col("dst")).otherwise(col("src")).as("w"))
    val out1 = oriented.select(col("u"), col("w").as("v1"))
    val wedges = out1.as("x")
      .join(oriented.select(col("u"), col("w").as("v2")).as("y"), Seq("u"))
      .filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"))
    val closing = oriented.select(col("u").as("v1"), col("w").as("v2"))
      .unionAll(oriented.select(col("w").as("v1"), col("u").as("v2")))
    val tris = wedges.join(closing, Seq("v1", "v2"), "left_semi")
    oriented.agg(count(lit(1)).as("n_edges"))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(tris.agg(count(lit(1)).as("n_triangles")))
  }

  val trianglesSql: String =
    s"""WITH cp AS ($copurchaseSql),
       |und AS (SELECT src, dst FROM cp WHERE src < dst),
       |deg AS (
       |  SELECT v, COUNT(*) AS d FROM
       |  (SELECT src AS v FROM und UNION ALL SELECT dst FROM und) GROUP BY v),
       |o AS (
       |  SELECT CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND und.src < und.dst)
       |              THEN und.src ELSE und.dst END AS u,
       |         CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND und.src < und.dst)
       |              THEN und.dst ELSE und.src END AS w
       |  FROM und JOIN deg ds ON und.src = ds.v JOIN deg dd ON und.dst = dd.v),
       |wedges AS (
       |  SELECT x.w AS v1, y.w AS v2 FROM o x JOIN o y ON x.u = y.u AND x.w < y.w),
       |closing AS (
       |  SELECT u AS v1, w AS v2 FROM o UNION ALL SELECT w, u FROM o),
       |tris AS (
       |  SELECT * FROM wedges WHERE EXISTS
       |    (SELECT 1 FROM closing c WHERE c.v1 = wedges.v1 AND c.v2 = wedges.v2))
       |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n_edges,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM tris) AS n_triangles""".stripMargin

  /** HITS hubs/authorities over the supplier→part supply graph (directed
    * bipartite: supplier −SUPPLIES→ part, distinct pairs from lineitem) —
    * the link-analysis complement of pageRank (graph_service.py's
    * centrality surface). Classic two-phase iteration: authorities from the
    * previous hubs, then hubs from the FRESH authorities. Inflow sums run
    * as DECIMAL(38,18) over each contribution's shortest double repr (the
    * pageRank recipe: exact, summation-order-independent, replayable in
    * DuckDB); each vector is L∞-normalized — divide by MAX, which is
    * order-independent and exactly rounded, so no libm enters (the classic
    * L2 sqrt would also be IEEE-exact, but max keeps the oracle flat).
    * Each iteration = two join+agg rounds materialized, same shuffle shape
    * as pageRank: linear in |edges|, no skew (bipartite keys). */
  def hits(lineitem: DataFrame, iters: Int = 5): DataFrame =
    hitsFrom(hitsEdges(lineitem), iters)

  /** The distinct supplier→part edge derivation [[hits]] pays per call —
    * exposed so the persisted edge store (Stores.hitsEdgeStore) can write
    * it once at ingest and the `graph_hits_store` read path can skip it. */
  def hitsEdges(lineitem: DataFrame): DataFrame =
    lineitem.select(
      (col("l_suppkey") + SuppBase).as("src"),
      (col("l_partkey") + PartBase).as("dst")).distinct()

  /** Production-shaped core of [[hits]]: runs the iteration over an
    * ALREADY-DERIVED edge set (the persisted store's bucketed scan, or the
    * inline derivation) — the per-call lineitem scan + distinct shuffle is
    * the caller's choice, not the algorithm's. */
  def hitsFrom(e0: DataFrame, iters: Int = 5): DataFrame = {
    // the final auth normalization dereferences the last round's raw
    // authority table — zero iterations has no such table (and no defined
    // HITS result), so fail fast instead of NPE-ing at plan build
    require(iters >= 1, s"hits needs at least one iteration, got $iters")
    // The two half-rounds join the edge set on ALTERNATING keys (src for
    // the auth update, dst for the hub update), so keep one
    // hash-distributed PERSISTED copy per key — every one of the 2·iters
    // joins then reuses its side's single edge shuffle, exchanging only
    // the node-sized rank vector per round. persist(), NOT materialize:
    // a localCheckpoint scan reports UnknownPartitioning (measured —
    // HitsPlanProbe), which silently re-exchanges the full edge set
    // every half-round; a persisted frame keeps outputPartitioning =
    // hashpartitioning(key) in the plan, so ENSURE_REQUIREMENTS adds no
    // edge-side Exchange. The dst copy derives FROM the src cache — one
    // scan+distinct total. Three spellings measured at the 100× tier
    // (median-of-3, comparable loads): build both copies from e0 = 121 s
    // but recomputes the full lineitem pass per copy (locally hidden by
    // the page cache; at a real 100 TB a second full scan); checkpoint e0
    // first = 153 s (an edge-sized checkpoint costs a block-manager
    // write+read and competes with the two loop caches for storage);
    // derive dst from the src cache = 127 s with a single base compute.
    val eBySrc = e0.repartition(col("src")).persist()
    // built EAGERLY: building the dst copy scans (and so populates) the src
    // copy too, so both half-rounds of round 1 plan against BUILT caches —
    // otherwise each paid a redundant full edge exchange (CachePartProbe)
    val eByDst = Iterative.build(eBySrc.repartition(col("dst")).persist())
    // decimal→double goes through a string cast: DuckDB's direct
    // decimal→double (int128/1e18 in FP) can land 1 ulp off Spark's
    // BigDecimal.doubleValue; both engines' decimal→string and
    // string→double are exact/correctly-rounded (ndcgEval precedent).
    // The double→decimal cast happens ONCE per node-side row before the
    // edge join (not once per edge): summing identical decimals is the
    // same value, and it cuts the string-parse count from |edges| to
    // |nodes| per round.
    def dec(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("decimal(38,18)")
    // raw is consumed twice (max agg + the normalize scan) — the CALLER
    // persists it first (and unpersists it once the normalized output is
    // materialized) or the whole join+agg half-round executes twice
    def lInfNorm(raw: DataFrame, key: String, out: String): DataFrame = {
      val m = raw.agg(max(col("raw")).as("m"))
      raw.crossJoin(broadcast(m))
        .select(col(key).as("node"), (col("raw") / col("m")).as(out))
    }
    var hub = eBySrc.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0).as("hub")).materialize
    var authRaw: DataFrame = null
    var prevHr: DataFrame = null
    var finalInputHub: DataFrame = null
    // the returned plan reads the LIVE hub checkpoint, so it must survive a
    // successful exit — but a mid-loop exception would otherwise pin it (and
    // the just-materialized newHub it aliases) for the session; the finally
    // block releases it only on the exceptional path
    var succeeded = false
    try {
    for (it <- 1 to iters) {
      // The rank vectors are node-sized and GROW WITH THE CORPUS — they
      // must never be broadcast: the r09-era broadcast spelling measured
      // 188 s at the 100× tier (per-round multi-MB broadcasts of a
      // corpus-scaled frame; on a real cluster it walks into the 8 GB
      // broadcast ceiling and driver memory). With the per-key
      // pre-partitioned edge copies, each half-round exchanges only the
      // node-sized rank vector; AQE still upgrades the join to broadcast
      // at small SFs where the vector genuinely is small.
      val hubD = hub.select(col("node"), dec(col("hub")).as("d"))
      authRaw = eBySrc.join(hubD.hint("SHUFFLE_HASH"), col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("d")).cast("string").cast("double").as("raw"))
      // authorities flow into the hub update UN-normalized: normalization
      // is a scalar divide and the update is linear, so the hub trajectory
      // is the classic one (scalars wash out under the hub-side L∞ norm) —
      // deferring it drops a persist + max-agg + normalize per round.
      // Magnitudes stay bounded: hub IS renormalized every round, so raw
      // auth ≤ in-degree and raw hub ≤ one round's degree product — far
      // inside DECIMAL(38,18)'s 20 integral digits at any realistic SF.
      val authD = authRaw.select(col("dst").as("node"), dec(col("raw")).as("d"))
      val hr = eByDst.join(authD.hint("SHUFFLE_HASH"), col("dst") === col("node"))
        .groupBy(col("src")).agg(sum(col("d")).cast("string").cast("double").as("raw"))
        .persist()
      val newHub = lInfNorm(hr, "src", "hub").materialize
      // newHub is materialized (localCheckpoint is eager) — the round's raw
      // table is superseded and its cache blocks can go; without this every
      // round's raw frame stayed pinned in executor memory for the life of
      // the session
      if (prevHr != null) prevHr.unpersist(blocking = false)
      prevHr = hr
      // the superseded hub checkpoint: dead once its consumers (this
      // round's evaluated half-rounds) have run — EXCEPT the final round's
      // input hub, which the post-loop authRaw re-evaluation still reads
      // (released below once auth is materialized)
      if (it < iters) release(hub) else finalInputHub = hub
      hub = newHub
    }
    if (prevHr != null) { prevHr.unpersist(blocking = false); prevHr = null }
    // the final (only) auth normalization: persist for the max-agg +
    // normalize double read, MATERIALIZE the normalized result (node-sized
    // table), then release the cache — returning a plan that leaned on the
    // persist would pin authRaw's blocks for the session lifetime, the
    // same leak the loop above just closed for hr
    val authRawP = authRaw.persist()
    val auth = lInfNorm(authRawP, "dst", "auth").materialize
    authRawP.unpersist(blocking = false)
    // auth is materialized — the final round's input hub checkpoint has no
    // remaining consumer and can release its node-sized blocks
    release(finalInputHub)
    val out = auth.select(lit("part").as("node_type"), col("node").as("node_id"),
        col("auth").as("score"))
      .unionAll(hub.select(lit("supplier").as("node_type"), col("node").as("node_id"),
        col("hub").as("score")))
    succeeded = true
    out
    } finally {
      // exception-safe: a failed job mid-loop must not pin the edge-sized
      // caches, the round's persisted raw frame, the final round's input-hub
      // checkpoint, or the LIVE hub checkpoint for the session — the
      // block-manager pressure mode the release() scaladoc describes. The
      // live hub is released only on the exceptional path (the returned plan
      // reads it on success); release() is null-safe and idempotent, so the
      // success-path releases above make the rest a no-op.
      if (prevHr != null) prevHr.unpersist(blocking = false)
      release(finalInputHub)
      if (!succeeded) release(hub)
      eBySrc.unpersist(blocking = false); eByDst.unpersist(blocking = false)
    }
  }

  /** k-core decomposition (iterative peeling) over the co-purchase graph:
    * repeatedly delete nodes of degree < k until none remain — the dense-
    * subgraph extractor that complements components (connectivity) and
    * labelProp (communities). Output: the surviving k-core members with
    * their in-core degree. Each round is one degree aggregate + one
    * broadcast-able semi-join of the edge table against the survivor set
    * (survivors only shrink); rounds are O(peel depth). Deterministic: the
    * fixed point is unique (the k-core is a closure — independent of peel
    * order), so the oracle replays a FIXED round budget: once converged,
    * further rounds are no-ops and any converged engine matches
    * (componentsSql precedent). */
  def kCore(lineitem: DataFrame, k: Int = 4, maxRounds: Int = 12): DataFrame = {
    var e = copurchase(lineitem).materialize
    var prevEdges = e.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // survivor set starts corpus-sized and only shrinks — plain semi-joins
      // (AQE upgrades them to broadcast once the set is small); one count
      // action per round doubles as the materialization trigger
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("knode"))
      val ne = e
        .join(keep, col("src") === col("knode"), "left_semi")
        .join(keep, col("dst") === col("knode"), "left_semi")
        .materialize
      val after = ne.count()
      converged = after == prevEdges
      prevEdges = after
      release(e) // the peeled-down round replaces the previous edge set
      e = ne
      rounds += 1
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** DuckDB oracle: replay `rounds` peels unconditionally (converged rounds
    * are no-ops). The co-purchase graph at every test SF converges well
    * inside 12 rounds; if Spark ever exits unconverged the hashes
    * legitimately diverge — a defect worth failing on. */
  def kCoreSql(k: Int = 4, rounds: Int = 12): String = {
    val steps = (1 to rounds).map { i =>
      s"""keep_$i AS (
         |  SELECT src AS knode FROM e_${i - 1} GROUP BY src HAVING COUNT(*) >= $k),
         |e_$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e_${i - 1} e
         |  JOIN keep_$i a ON e.src = a.knode
         |  JOIN keep_$i b ON e.dst = b.knode)""".stripMargin
    }.mkString(",\n")
    s"""WITH e_0 AS MATERIALIZED ($copurchaseSql),
       |$steps
       |SELECT src AS node, COUNT(*) AS core_deg FROM e_$rounds GROUP BY src""".stripMargin
  }

  /** Community detection via synchronous label propagation over the
    * co-purchase graph — the lightweight community surface next to
    * connectedComponents (which finds *connectivity*, not density). Every
    * node starts as its own label; each round every node adopts the most
    * frequent label among its neighbors, ties broken by MIN label — pure
    * integer counting with a total argmax order, so a FIXED round budget is
    * bit-deterministic and replayable in DuckDB (no convergence test
    * needed). Per round: one edges⋈labels join + a (dst,label) count + a
    * bounded argmax agg — two shuffles linear in |edges|, the Pregel LPA
    * shape. The argmax is `max(struct(c, -label))`: max count, then min
    * label (oracle-determinism recipe). */
  def labelProp(lineitem: DataFrame, rounds: Int = 4): DataFrame =
    labelPropEdges(copurchase(lineitem).materialize, rounds)

  /** Same fixed-round update over a PRE-MATERIALIZED edge table — lets
    * callers that already hold the edges (modularity) avoid deriving the
    * co-purchase self-join twice. */
  private[operators] def labelPropEdges(e: DataFrame, rounds: Int): DataFrame = {
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label")).materialize
    // every round joins the static edge set on src — persisted co-partition
    // (NOT checkpoint: its scan erases the partitioning, HitsPlanProbe) so
    // only the node-sized label side moves per round
    val eSrc = Iterative.build(e.repartition(col("src")).persist())
    try {
    for (_ <- 1 to rounds) {
      val best = eSrc.join(labels.hint("SHUFFLE_HASH"), col("src") === col("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("label")).as("neg"))).as("m"))
        .select(col("dst"), (-col("m.neg")).as("blabel"))
      val next = labels.join(best, col("node") === col("dst"), "left_outer")
        .select(col("node"), coalesce(col("blabel"), col("label")).as("label"))
        .materialize
      release(labels) // superseded round — new labels are materialized
      labels = next
    }
    labels
    // loop-only; final labels are a checkpoint scan. finally-scoped so a
    // failed round can't pin the edge cache for the session
    } finally eSrc.unpersist(blocking = false)
  }

  /** DuckDB oracle: replay the same fixed-round synchronous update
    * (count → max-count → min-label within the max) per round. */
  def labelPropSql(rounds: Int = 4): String = {
    val steps = (1 to rounds).map { i =>
      s"""cnt_$i AS MATERIALIZED (
         |  SELECT e.dst, l.label, COUNT(*) AS c
         |  FROM e JOIN l_${i - 1} l ON e.src = l.node GROUP BY e.dst, l.label),
         |mx_$i AS (SELECT dst, MAX(c) AS mc FROM cnt_$i GROUP BY dst),
         |b_$i AS (
         |  SELECT cnt_$i.dst, MIN(cnt_$i.label) AS blabel
         |  FROM cnt_$i JOIN mx_$i ON cnt_$i.dst = mx_$i.dst AND cnt_$i.c = mx_$i.mc
         |  GROUP BY cnt_$i.dst),
         |l_$i AS MATERIALIZED (
         |  SELECT l.node, COALESCE(b.blabel, l.label) AS label
         |  FROM l_${i - 1} l LEFT JOIN b_$i b ON l.node = b.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($copurchaseSql),
       |l_0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |$steps
       |SELECT node, label FROM l_$rounds""".stripMargin
  }

  /** Modularity of the label-propagation communities — the quality score
    * that tells you whether the community structure is real (Newman's Q;
    * what GDS reports next to every community algorithm). Kept ENTIRELY in
    * the integers: with directed-double edge counts (m2 = 2m, e_in2 = 2·
    * intra-edges, deg_sum = Σ degrees), Q·m2² = Σ_c (e_in2·m2 − deg_sum²)
    * — so each community's contribution is an exact BIGINT and the oracle
    * hash-matches where the float Q would 1-ulp drift. Two broadcast-ish
    * joins of labels onto edges + one community-keyed groupBy. */
  def modularity(lineitem: DataFrame, rounds: Int = 4): DataFrame = {
    val e = copurchase(lineitem).materialize
    val labels = labelPropEdges(e, rounds)
    val j = e
      .join(labels.select(col("node"), col("label").as("la")), col("src") === col("node"))
      .drop("node")
      .join(labels.select(col("node"), col("label").as("lb")), col("dst") === col("node"))
      .drop("node")
    val m = e.agg(count(lit(1)).as("m2"))
    val nn = labels.groupBy(col("label").as("community")).agg(count(lit(1)).as("n_nodes"))
    j.groupBy(col("la").as("community"))
      .agg(
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("e_in2"),
        count(lit(1)).as("deg_sum"))
      .join(nn, "community")
      .crossJoin(broadcast(m))
      .withColumn("contrib", col("e_in2") * col("m2") - col("deg_sum") * col("deg_sum"))
      .select(col("community"), col("n_nodes"), col("e_in2"), col("deg_sum"),
        col("m2"), col("contrib"))
  }

  def modularitySql(rounds: Int = 4): String =
    s"""WITH labs AS MATERIALIZED (${labelPropSql(rounds)}),
       |ee AS MATERIALIZED ($copurchaseSql),
       |j AS (
       |  SELECT a.label AS la, b.label AS lb
       |  FROM ee JOIN labs a ON ee.src = a.node JOIN labs b ON ee.dst = b.node),
       |m AS (SELECT COUNT(*) AS m2 FROM ee),
       |nn AS (SELECT label AS community, COUNT(*) AS n_nodes FROM labs GROUP BY 1),
       |per AS (
       |  SELECT la AS community,
       |    CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS e_in2,
       |    COUNT(*) AS deg_sum
       |  FROM j GROUP BY 1)
       |SELECT p.community, nn.n_nodes, p.e_in2, p.deg_sum, m.m2,
       |  p.e_in2 * m.m2 - p.deg_sum * p.deg_sum AS contrib
       |FROM per p JOIN nn ON nn.community = p.community CROSS JOIN m""".stripMargin

  /** DuckDB oracle replaying the full HITS iteration (decimal-exact sums +
    * max-normalization make every iterate bit-identical). */
  /** Mirrors [[hits]] exactly: authorities ride UN-normalized into the hub
    * update (scalars wash out under the hub-side L∞ norm); the single auth
    * normalization happens on the final raw table. */
  def hitsSql(iters: Int = 5): String = {
    val steps = (1 to iters).map { i =>
      s"""ar_$i AS MATERIALIZED (
         |  SELECT e.dst, CAST(CAST(SUM(CAST(CAST(h.hub AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS raw
         |  FROM e JOIN h_${i - 1} h ON e.src = h.node GROUP BY e.dst),
         |hr_$i AS MATERIALIZED (
         |  SELECT e.src, CAST(CAST(SUM(CAST(CAST(a.raw AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS raw
         |  FROM e JOIN ar_$i a ON e.dst = a.dst GROUP BY e.src),
         |h_$i AS MATERIALIZED (
         |  SELECT src AS node, raw / (SELECT MAX(raw) FROM hr_$i) AS hub FROM hr_$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey + $SuppBase AS src, l_partkey + $PartBase AS dst FROM lineitem),
       |h_0 AS (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS hub FROM e),
       |$steps
       |SELECT 'part' AS node_type, dst AS node_id,
       |       raw / (SELECT MAX(raw) FROM ar_$iters) AS score FROM ar_$iters
       |UNION ALL
       |SELECT 'supplier' AS node_type, node AS node_id, hub AS score FROM h_$iters""".stripMargin
  }
}
