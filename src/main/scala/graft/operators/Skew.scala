package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation combinators. AQE's runtime skew-join splitting handles
  * most cases; explicit salting is for the pathologies AQE can't fix —
  * a single hot key whose post-filter rows still exceed one executor's
  * memory (the "null key" / "empty string" / "deleted user" classics at
  * 100 TB).
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a per-row salt in
    * [0, salts); the small side is replicated `salts`× with every salt
    * value; the join key becomes (key, salt). One hot key now spreads over
    * `salts` reducers instead of melting one. Result set is identical to
    * the unsalted join — the salt only routes rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()), lit(salts.toLong)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig
      .join(saltedSmall, col(bigKey) === col(smallKey) && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Two-phase distinct count for skewed group keys: per-(key, salt)
    * partial distinct, then exact merge — the hot key's distinct set is
    * built across `salts` reducers. Exact (not approximate). */
  /** Join-key skew profiler — the diagnostic you run BEFORE deciding to
    * salt: per-key row counts on the fact side, top-N heaviest keys with
    * their share of the table, plus the key's multiple of a uniform share
    * (skew_x = share · n_keys — 1.0 means perfectly uniform). One
    * map-combined groupBy + a broadcast-back of two scalars; the top-N cut
    * is TakeOrderedAndProject, never a global sort. A key with skew_x in
    * the hundreds is the one AQE's skew-join splits or saltedJoin spreads. */
  def joinSkewStats(fact: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val counts = fact.groupBy(col(key).as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("total_rows"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", col("cnt").cast("double") / col("total_rows").cast("double"))
      .withColumn("skew_x",
        col("share") * col("n_keys").cast("double"))
      .select(col("key"), col("cnt"), col("share"), col("skew_x"))
      .orderBy(desc("cnt"), col("key"))
      .limit(topN)
  }

  def joinSkewStatsSql(key: String = "l_suppkey", table: String = "lineitem",
                       topN: Int = 20): String =
    s"""WITH c AS (SELECT $key AS key, COUNT(*) AS cnt FROM $table GROUP BY 1),
       |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows, COUNT(*) AS n_keys FROM c)
       |SELECT key, cnt,
       |  CAST(cnt AS DOUBLE) / CAST(total_rows AS DOUBLE) AS share,
       |  CAST(cnt AS DOUBLE) / CAST(total_rows AS DOUBLE) * CAST(n_keys AS DOUBLE) AS skew_x
       |FROM c, t ORDER BY cnt DESC, key LIMIT $topN""".stripMargin

  /** Equi-join cardinality estimation BEFORE running the join — the
    * number the optimizer guesses and the engineer wants exactly:
    * |A ⋈ B| = Σ_k cntA(k)·cntB(k). Two map-combined per-key counts + a
    * count-table join (each far smaller than the join itself), so you
    * learn whether the join explodes — and which keys explode it — for a
    * fraction of its cost. Emits the top-N contributing keys plus the
    * exact total and matched-key count on every row (broadcast scalars).
    * All integers: hash-exact. */
  def joinCardEst(left: DataFrame, right: DataFrame, leftKey: String,
                  rightKey: String, topN: Int = 10): DataFrame = {
    val ca = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("ca"))
    val cb = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("cb"))
    val j = ca.join(cb, "key").withColumn("pairs", col("ca") * col("cb"))
    val totals = j.agg(sum(col("pairs")).as("total_pairs"),
      count(lit(1)).as("n_join_keys"))
    j.crossJoin(broadcast(totals))
      .select(col("key"), col("ca"), col("cb"), col("pairs"),
        col("total_pairs"), col("n_join_keys"))
      .orderBy(desc("pairs"), col("key"))
      .limit(topN)
  }

  def joinCardEstSql(leftTable: String = "orders", leftKey: String = "o_orderkey",
                     rightTable: String = "lineitem", rightKey: String = "l_orderkey",
                     topN: Int = 10): String =
    s"""WITH ca AS (SELECT $leftKey AS key, COUNT(*) AS ca FROM $leftTable GROUP BY 1),
       |cb AS (SELECT $rightKey AS key, COUNT(*) AS cb FROM $rightTable GROUP BY 1),
       |j AS (SELECT ca.key, ca.ca, cb.cb, ca.ca * cb.cb AS pairs
       |      FROM ca JOIN cb ON ca.key = cb.key),
       |t AS (SELECT CAST(SUM(pairs) AS BIGINT) AS total_pairs,
       |             COUNT(*) AS n_join_keys FROM j)
       |SELECT j.key, j.ca, j.cb, j.pairs, t.total_pairs, t.n_join_keys
       |FROM j CROSS JOIN t
       |ORDER BY pairs DESC, key LIMIT $topN""".stripMargin

  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
                          salts: Int = 16): DataFrame =
    df
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("partial"))
      .groupBy(col(key))
      .agg(sum(col("partial")).as("n_distinct"))
}
