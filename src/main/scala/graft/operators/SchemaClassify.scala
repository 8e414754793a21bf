package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL-schema business-domain classification analog
  * (services/sql/universal_sql_schema_parser.py): rule-based keyword
  * classification of schema-ish strings into domains — here over
  * `part(p_type, p_brand)` as the schema-metadata stand-in. Pure narrow
  * transform + one count rollup.
  */
object SchemaClassify {

  /** Classify each part into a "business domain" via keyword rules, and
    * roll up counts per (domain, p_brand). */
  def classify(part: DataFrame): DataFrame =
    part
      .withColumn("domain",
        when(col("p_type").isin("ECONOMY", "PROMO"), "pricing")
          .when(col("p_type").isin("SMALL", "MEDIUM", "LARGE"), "sizing")
          .otherwise("general"))
      .groupBy(col("domain"), col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        avg(col("p_size")).cast("double").as("avg_size"))

  val classifySql: String =
    """SELECT CASE WHEN p_type IN ('ECONOMY','PROMO') THEN 'pricing'
      |            WHEN p_type IN ('SMALL','MEDIUM','LARGE') THEN 'sizing'
      |            ELSE 'general' END AS domain,
      |       p_brand, COUNT(*) AS n_parts,
      |       CAST(CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_size
      |FROM part GROUP BY 1, 2""".stripMargin
}
