package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.web.Pages
import Derived._

/** Graft web-pages suite: synthesize the input_hint table, geocode from
  * html, kNN-join to the derived way graph, and verify the text
  * byte-identity invariant — all DuckDB-oracled.
  */
object QueriesWeb {

  val KnnRes = 7

  private def mmSql(e: String) = s"CAST(FLOOR(($e) * 1000 + 0.5) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pages → geocode → exact kNN to way nodes, text checksum carried
    "q36_pages_knn" -> ((s, d) => {
      val pages = Pages.synthesizeFromDocuments(s, d)
      Pages.nearestWayNode(pages, nodesDF(s, d), KnnRes)
        .select(col("url"), col("nn_nid"),
          expr(mmSql("dist_m")).as("dist_mm"),
          md5(col("text")).as("text_md5"))
    }),

    // byte-identity invariant: checksums after a full synth+geocode pass
    // equal checksums of the source documents
    "q37_pages_text_identity" -> ((s, d) => {
      val pages = Pages.geocode(Pages.synthesizeFromDocuments(s, d))
      Pages.textChecksums(pages)
    }))

  val oracles: Map[String, String] = Map(
    "q36_pages_knn" ->
      s"""WITH $oracleWaysCte,
         |pages AS (
         |  SELECT concat('doc://', CAST(doc_id AS VARCHAR)) AS url,
         |    ((doc_id * 7919123) % 1700000 - 850000) / 10000.0 AS plat,
         |    ((doc_id * 104729177) % 3600000 - 1800000) / 10000.0 AS plon,
         |    md5(text) AS text_md5
         |  FROM documents WHERE doc_id % 10 <> 0),
         |d AS (
         |  SELECT url, nid, text_md5,
         |    ${haversineSql("plat", "plon", "lat", "lon")} AS dist,
         |    ROW_NUMBER() OVER (PARTITION BY url ORDER BY
         |      ${haversineSql("plat", "plon", "lat", "lon")} ASC, nid ASC) AS rn
         |  FROM pages CROSS JOIN nodes)
         |SELECT url, nid AS nn_nid, ${mmSql("dist")} AS dist_mm, text_md5
         |FROM d WHERE rn = 1""".stripMargin,

    "q37_pages_text_identity" ->
      """SELECT concat('doc://', CAST(doc_id AS VARCHAR)) AS url,
        |  md5(text) AS text_md5
        |FROM documents""".stripMargin)
}
