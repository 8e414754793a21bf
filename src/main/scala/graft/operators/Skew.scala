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
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
                          salts: Int = 16): DataFrame =
    df
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("partial"))
      .groupBy(col(key))
      .agg(sum(col("partial")).as("n_distinct"))
}
