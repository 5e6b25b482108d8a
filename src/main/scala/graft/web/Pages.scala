package graft.web

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.SpatialJoins

/** The graft input table (BASELINE.json `input_hint`):
  * `pages(url string, warc_ts timestamp, html binary, text string,
  * lang string)` — Common-Crawl-like pages geocoded to ways.
  *
  * Per-row invariant: `text` survives the whole pipeline byte-identical
  * per `url` (verified via md5/sha checksums at both ends; the column is
  * carried opaquely, never re-encoded).
  *
  * Synthesis is deterministic from the driver's `documents` table (no
  * external data, no RNG): coordinates are integer-arithmetic functions
  * of `doc_id`, embedded in `html` as `geo:i:<latE4>,<lonE4>` URIs
  * (integer micro-degrees — float→string formatting is engine-dependent,
  * integers are not). 1 in 10 pages has no coordinates (null-geocode
  * path).
  */
object Pages {

  val GeoUriRe = "geo:i:(-?\\d+),(-?\\d+)"

  /** Deterministic pages table derived from `documents`. */
  def synthesizeFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr(
        "concat('doc://', CAST(doc_id AS STRING)) AS url",
        "doc_id",
        "CAST(doc_id * 1000000 AS TIMESTAMP) AS warc_ts",
        // integer 1e-4-degree coordinates for 9 of 10 pages
        "CASE WHEN doc_id % 10 <> 0 THEN (doc_id * 7919123) % 1700000 - 850000 END AS lat_e4",
        "CASE WHEN doc_id % 10 <> 0 THEN (doc_id * 104729177) % 3600000 - 1800000 END AS lon_e4",
        "text", "lang")
      .selectExpr(
        "url", "warc_ts",
        """CAST(CASE WHEN lat_e4 IS NOT NULL
          |  THEN concat('<html><head></head><body><a href="geo:i:',
          |    CAST(lat_e4 AS STRING), ',', CAST(lon_e4 AS STRING),
          |    '">map</a></body></html>')
          |  ELSE '<html><body>no geo</body></html>' END AS BINARY) AS html"""
          .stripMargin.replace("\n", " "),
        "text", "lang")
  }

  /** Extract coordinates from the html geo-URI; null when absent.
    * `text` is carried through untouched (byte identity).
    */
  def geocode(pages: DataFrame): DataFrame =
    pages
      .withColumn("html_s", col("html").cast("string"))
      .withColumn("lat_s", regexp_extract(col("html_s"), GeoUriRe, 1))
      .withColumn("lon_s", regexp_extract(col("html_s"), GeoUriRe, 2))
      .withColumn("plat",
        when(col("lat_s") =!= "", col("lat_s").cast("long") / 10000.0))
      .withColumn("plon",
        when(col("lon_s") =!= "", col("lon_s").cast("long") / 10000.0))
      .drop("html_s", "lat_s", "lon_s")

  /** Geocoded pages → exact nearest way-node (cell-ring kNN).
    * Ungeocoded pages are left out (the reference-equivalent of
    * unpositioned input).
    */
  def nearestWayNode(pages: DataFrame, nodes: DataFrame, res: Int,
      nodesCellOpt: Option[DataFrame] = None): DataFrame = {
    val geocoded = geocode(pages)
      .filter(col("plat").isNotNull)
      .select(col("url").as("pid"), col("plat"), col("plon"),
        col("text"), col("warc_ts"), col("lang"))
    SpatialJoins.knnJoin(
        geocoded.select("pid", "plat", "plon"), nodes, res,
        nodesCellOpt = nodesCellOpt)
      .join(geocoded, Seq("pid"))
      .select(col("pid").as("url"), col("nn_nid"), col("dist_m"),
        col("text"), col("lang"))
  }

  /** Byte-identity checksum per url (input_hint invariant). */
  def textChecksums(pages: DataFrame, urlCol: String = "url"): DataFrame =
    pages.select(col(urlCol).as("url"), md5(col("text")).as("text_md5"))
}
