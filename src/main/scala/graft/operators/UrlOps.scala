package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL extraction + host-level curation — the C4/RefinedWeb front door:
  * every web-scale corpus starts by extracting the URLs a page links to
  * (or came from), rolling them up per host, and gating on a host
  * blocklist. Both steps are narrow regexp scans + one host-keyed groupBy;
  * nothing grows with corpus² and the blocklist is a broadcast-sized
  * artifact at any scale.
  *
  * The test corpus has no embedded URLs, so — same recipe as the markdown /
  * code / DDL corpora (Loaders.syntheticMarkdownView precedent) — a
  * deterministic web view first plants URLs derived from each document's
  * own words; extraction then does real regexp work the oracle replays.
  */
object UrlOps {

  /** Deterministic URL-bearing view: two links per document (a content
    * link derived from the doc's leading word and doc_id, and a cdn asset
    * link), planted mid-text. */
  def syntheticWebView(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"), col("lang"), col("source"),
      concat(
        col("text"), lit(" see https://"), col("source"),
        lit(".example.com/"), col("lang"), lit("/page-"), col("doc_id"),
        lit(" and http://cdn"), pmod(col("doc_id"), lit(7L)),
        lit(".assets.net/img-"), pmod(col("doc_id"), lit(97L)), lit(".png tail")
      ).as("page_text"))

  // NOTE: no continuation line may start with `||` — this fragment is
  // interpolated into an outer stripMargin string, which would eat a pipe.
  private val synthWebSql: String =
    """SELECT doc_id, lang, source,
      |  text || ' see https://' || source || '.example.com/' || lang || '/page-' ||
      |    doc_id || ' and http://cdn' || (doc_id % 7) || '.assets.net/img-' ||
      |    (doc_id % 97) || '.png tail' AS page_text
      |FROM documents""".stripMargin

  /** Host-level rollup of every URL in the corpus: regexp-extract all
    * http(s) URLs, parse scheme/host, aggregate (n_urls, n_docs) per host
    * and mark blocklisted hosts (here: the cdn asset farm). The blocklist
    * verdict at host granularity is what C4-style pipelines join back to
    * drop documents — `n_docs` of a blocked host is exactly the number of
    * docs that join would remove. */
  def urlHostStats(documents: DataFrame, blockPattern: String = "^cdn"): DataFrame = {
    val web = syntheticWebView(documents)
    web.select(col("doc_id"),
        explode(regexp_extract_all(col("page_text"), lit("https?://[^ ]+"), lit(0))).as("url"))
      .withColumn("host", regexp_extract(col("url"), "^https?://([^/]+)", 1))
      .withColumn("https", col("url").startsWith("https://"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(when(col("https"), 1L).otherwise(0L)).as("n_https"))
      .withColumn("blocked", col("host").rlike(blockPattern))
  }

  def urlHostStatsSql(blockPattern: String = "^cdn"): String =
    s"""WITH web AS ($synthWebSql),
       |u AS (
       |  SELECT doc_id, unnest(regexp_extract_all(page_text, 'https?://[^ ]+')) AS url
       |  FROM web)
       |SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       |  COUNT(*) AS n_urls,
       |  COUNT(DISTINCT doc_id) AS n_docs,
       |  CAST(SUM(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END) AS BIGINT) AS n_https,
       |  regexp_matches(regexp_extract(url, '^https?://([^/]+)', 1), '$blockPattern')
       |    AS blocked
       |FROM u
       |GROUP BY host, blocked""".stripMargin
}
