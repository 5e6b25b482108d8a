package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.media.Media

/** Multimodal-column suite (builder brief): binary media columns with
  * typed metadata, batched (stub-)decode + feature extraction. Payloads
  * are md5-derived so BOTH engines construct identical bytes and the
  * driver's hash gate covers the whole pipeline, decode included.
  */
object QueriesMedia {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column + typed metadata round-trip: byte identity via hex
    "q51_media_meta" -> ((s, d) =>
      Media.synthesize(docs(s, d)).select(
        col("doc_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        lower(hex(col("bytes"))).as("bytes_hex"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.n_frames").cast("long").as("n_frames"))),

    // batched stub-decode + per-row features (histogram stringified —
    // array columns are unhashable in the driver's compare)
    "q52_media_features" -> ((s, d) =>
      Media.extractFeatures(Media.synthesize(docs(s, d))).select(
        col("doc_id"), col("kind"),
        concat_ws(";", expr("transform(hist, h -> CAST(h AS STRING))"))
          .as("hist_s"),
        col("mean_c"))))

  private val rounds = 4
  private val nBytes = rounds * 16

  val oracles: Map[String, String] = Map(
    "q51_media_meta" ->
      s"""SELECT doc_id,
         |  ${Media.KindSql} AS kind,
         |  CAST(octet_length(${Media.payloadSql("doc_id", rounds)}) AS BIGINT)
         |    AS n_bytes,
         |  lower(to_hex(${Media.payloadSql("doc_id", rounds)})) AS bytes_hex,
         |  CAST(doc_id % 8 + 1 AS BIGINT) AS width,
         |  CAST(doc_id % 6 + 1 AS BIGINT) AS height,
         |  CAST(doc_id % 5 + 1 AS BIGINT) AS n_frames
         |FROM documents""".stripMargin,

    "q52_media_features" ->
      s"""WITH pay AS (
         |  SELECT doc_id, ${Media.KindSql} AS kind,
         |    lower(to_hex(${Media.payloadSql("doc_id", rounds)})) AS hx
         |  FROM documents),
         |bv AS (
         |  SELECT doc_id, kind,
         |    list_transform(range($nBytes),
         |      i -> CAST('0x' || substr(hx, CAST(i * 2 + 1 AS INT), 2) AS BIGINT)) AS b
         |  FROM pay)
         |SELECT doc_id, kind,
         |  array_to_string(list_transform(range(16),
         |    k -> CAST(len(list_filter(b, v -> v // 16 = k)) AS VARCHAR)), ';')
         |    AS hist_s,
         |  CAST(list_sum(b) * 100 // $nBytes AS BIGINT) AS mean_c
         |FROM bv""".stripMargin)
}
