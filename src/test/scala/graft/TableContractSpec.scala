package graft

import org.apache.spark.sql.types._

/** Loader-boundary schema contract: one assertion per table pinning the
  * column names and types every downstream operator assumes. The corpus
  * regenerated under the repo once (round 6: events.ts drifted from
  * TIMESTAMP(NANOS)-as-long to timestamp[us] and broke 22 queries with
  * analysis exceptions); this spec turns that failure mode into a one-line
  * message naming the table and column instead.
  *
  * Timestamp-bearing source columns (o_orderdate, l_shipdate) may surface
  * as TIMESTAMP or TIMESTAMP_NTZ depending on the writer's annotation —
  * every consumer treats them uniformly under the UTC session, so the
  * contract accepts either. events.ts is the exception: Tables.events
  * adapts whatever physical encoding arrives and GUARANTEES TimestampType.
  */
class TableContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private val TS = Set[DataType](TimestampType, TimestampNTZType)

  private def check(table: String, df: org.apache.spark.sql.DataFrame,
                    expect: Seq[(String, Either[DataType, Set[DataType]])]): Unit = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(df.schema.fieldNames.toSeq == expect.map(_._1),
      s"$table: columns ${df.schema.fieldNames.toSeq} != expected ${expect.map(_._1)}")
    expect.foreach {
      case (c, Left(t)) =>
        assert(actual(c) == t, s"$table.$c: ${actual(c)} != expected $t")
      case (c, Right(ts)) =>
        assert(ts.contains(actual(c)), s"$table.$c: ${actual(c)} not in expected $ts")
    }
  }

  private def t(dt: DataType) = Left(dt)
  private val anyTs = Right(TS)

  test("region contract")   { check("region", sources.Tables.region(spark, dir),
    Seq("r_regionkey" -> t(IntegerType), "r_name" -> t(StringType))) }

  test("nation contract")   { check("nation", sources.Tables.nation(spark, dir),
    Seq("n_nationkey" -> t(IntegerType), "n_name" -> t(StringType), "n_regionkey" -> t(IntegerType))) }

  test("customer contract") { check("customer", sources.Tables.customer(spark, dir),
    Seq("c_custkey" -> t(LongType), "c_name" -> t(StringType), "c_nationkey" -> t(IntegerType),
        "c_acctbal" -> t(DoubleType), "c_mktsegment" -> t(StringType))) }

  test("supplier contract") { check("supplier", sources.Tables.supplier(spark, dir),
    Seq("s_suppkey" -> t(LongType), "s_name" -> t(StringType), "s_nationkey" -> t(IntegerType),
        "s_acctbal" -> t(DoubleType))) }

  test("part contract")     { check("part", sources.Tables.part(spark, dir),
    Seq("p_partkey" -> t(LongType), "p_name" -> t(StringType), "p_brand" -> t(StringType),
        "p_type" -> t(StringType), "p_size" -> t(IntegerType), "p_retailprice" -> t(DoubleType))) }

  test("orders contract")   { check("orders", sources.Tables.orders(spark, dir),
    Seq("o_orderkey" -> t(LongType), "o_custkey" -> t(LongType), "o_orderstatus" -> t(StringType),
        "o_totalprice" -> t(DoubleType), "o_orderdate" -> anyTs, "o_orderpriority" -> t(StringType))) }

  test("lineitem contract") { check("lineitem", sources.Tables.lineitem(spark, dir),
    Seq("l_orderkey" -> t(LongType), "l_partkey" -> t(LongType), "l_suppkey" -> t(LongType),
        "l_linenumber" -> t(IntegerType), "l_quantity" -> t(DoubleType),
        "l_extendedprice" -> t(DoubleType), "l_discount" -> t(DoubleType), "l_tax" -> t(DoubleType),
        "l_returnflag" -> t(StringType), "l_linestatus" -> t(StringType), "l_shipdate" -> anyTs)) }

  test("events contract — ts is ALWAYS session TimestampType after the adapter") {
    check("events", sources.Tables.events(spark, dir),
      Seq("event_id" -> t(LongType), "ts" -> t(TimestampType), "user_id" -> t(LongType),
          "event_type" -> t(StringType), "value" -> t(DoubleType), "props" -> t(StringType)))
  }

  test("documents contract") { check("documents", sources.Tables.documents(spark, dir),
    Seq("doc_id" -> t(LongType), "text" -> t(StringType), "lang" -> t(StringType),
        "source" -> t(StringType), "n_chars" -> t(LongType))) }

  test("embeddings contract") { check("embeddings", sources.Tables.embeddings(spark, dir),
    Seq("vec_id" -> t(LongType), "embedding" -> t(ArrayType(FloatType, containsNull = true)),
        "label" -> t(IntegerType))) }
}
