package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.media.Media

/** Multimodal-column suite (builder brief): binary media columns with
  * typed metadata, batched decode + feature extraction. Images are REAL
  * PPM P6 containers ([[graft.media.Media.Codec]] is a complete parser);
  * audio/video are headerless raw samples. Raster/sample bytes are
  * md5-derived so BOTH engines construct identical container bytes and
  * the driver's hash gate covers the whole pipeline, decode included —
  * the DuckDB oracle rebuilds the PPM header with `encode(...)` and the
  * raster with `from_hex(md5(...))`, so a header-parse bug on the Spark
  * side WOULD show up as a q52 histogram mismatch.
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
        col("mean_c"))),

    // perceptual-hash near-dup pairs: planted near-dup payloads →
    // batched decode → 63-bit aHash → banded Hamming LSH (shared with
    // the text SimHash path), exact bit_count verify
    "q106_media_phash" -> ((s, d) =>
      Media.phashPairs(Media.synthesizeNearDup(
        docs(s, d).select("doc_id")))))

  private val rounds = 4
  private val nBytes = rounds * 16

  /** The image raster as a HEX string: the md5 chain truncated to
    * width·height·3 bytes (2 hex chars each) — md5() is lowercase hex
    * in DuckDB, matching Spark's lower(hex(...)).
    */
  private def pixHexSql: String = {
    val chain = (0 until Media.PixRounds)
      .map(i => s"md5(CAST(doc_id AS VARCHAR) || '#$i')").mkString(" || ")
    s"substr($chain, 1, CAST((doc_id % 8 + 1) * (doc_id % 6 + 1) * 6 AS INT))"
  }

  /** The full media payload blob per row: image rows a real PPM P6
    * container (`encode` builds the ASCII header, `from_hex` the
    * raster), audio/video the headerless md5 payload.
    */
  private def payloadBlobSql: String =
    s"""CASE WHEN doc_id % 3 = 0 THEN
       |    encode('P6' || chr(10) || CAST(doc_id % 8 + 1 AS VARCHAR) || ' '
       |      || CAST(doc_id % 6 + 1 AS VARCHAR) || chr(10) || '255'
       |      || chr(10)) || from_hex($pixHexSql)
       |  ELSE ${Media.payloadSql("doc_id", rounds)} END"""
      .stripMargin.replace("\n", " ")

  val oracles: Map[String, String] = Map(
    "q51_media_meta" ->
      s"""WITH m AS (
         |  SELECT doc_id, ${Media.KindSql} AS kind, $payloadBlobSql AS b
         |  FROM documents)
         |SELECT doc_id, kind,
         |  CAST(octet_length(b) AS BIGINT) AS n_bytes,
         |  lower(to_hex(b)) AS bytes_hex,
         |  CAST(doc_id % 8 + 1 AS BIGINT) AS width,
         |  CAST(doc_id % 6 + 1 AS BIGINT) AS height,
         |  CAST(doc_id % 5 + 1 AS BIGINT) AS n_frames
         |FROM m""".stripMargin,

    // q52: the decode's sample view — image rows decode to the RASTER
    // bytes only (header stripped by the PPM parse), audio/video to the
    // raw payload
    "q52_media_features" ->
      s"""WITH pay AS (
         |  SELECT doc_id, ${Media.KindSql} AS kind,
         |    CASE WHEN doc_id % 3 = 0
         |      THEN CAST((doc_id % 8 + 1) * (doc_id % 6 + 1) * 3 AS INT)
         |      ELSE $nBytes END AS ns,
         |    CASE WHEN doc_id % 3 = 0 THEN $pixHexSql
         |      ELSE lower(to_hex(${Media.payloadSql("doc_id", rounds)})) END
         |      AS hx
         |  FROM documents),
         |bv AS (
         |  SELECT doc_id, kind, ns,
         |    list_transform(range(ns),
         |      i -> CAST('0x' || substr(hx, CAST(i * 2 + 1 AS INT), 2) AS BIGINT)) AS b
         |  FROM pay)
         |SELECT doc_id, kind,
         |  array_to_string(list_transform(range(16),
         |    k -> CAST(len(list_filter(b, v -> v // 16 = k)) AS VARCHAR)), ';')
         |    AS hist_s,
         |  CAST(list_sum(b) * 100 // ns AS BIGINT) AS mean_c
         |FROM bv""".stripMargin,

    // q106: hashes replayed from the md5 HEX strings (byte i of block b
    // = hex digits 2i..2i+1), then the q61-style banded pair replay
    "q106_media_phash" -> phashPairsOracle)

  /** q106 oracle: aHash bit i reads sample i = byte (i mod 16) of block
    * (i div 16); blocks 0-2 seed from the doc group (doc_id div 7),
    * block 3 from the doc itself — same construction as
    * [[Media.synthesizeNearDup]], replayed from hex instead of bytes.
    */
  private def phashPairsOracle: String = {
    val (maxHam, bands, maxBucket, groupSize) = (15, 4, 1000, 7)
    val bits = (0 until 63).map { i =>
      val m = s"m${i / 16}"
      val off = (i % 16) * 2 + 1
      s"CASE WHEN CAST('0x' || substr($m, $off, 2) AS INT) > 127" +
        s" THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH ph0 AS (
       |  SELECT doc_id,
       |    md5('g' || CAST(doc_id // $groupSize AS VARCHAR) || '#0') AS m0,
       |    md5('g' || CAST(doc_id // $groupSize AS VARCHAR) || '#1') AS m1,
       |    md5('g' || CAST(doc_id // $groupSize AS VARCHAR) || '#2') AS m2,
       |    md5('p' || CAST(doc_id AS VARCHAR)) AS m3
       |  FROM documents),
       |ph AS (SELECT doc_id, CAST($bits AS BIGINT) AS sh FROM ph0),
       |bk AS (
       |  SELECT doc_id, sh, t.band, (sh >> (t.band * 16)) & 65535 AS key
       |  FROM ph, (SELECT CAST(range AS INTEGER) AS band
       |            FROM range($bands)) t),
       |kept AS (
       |  SELECT band, key FROM bk GROUP BY band, key
       |  HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |    x.sh AS sa, y.sh AS sb
       |  FROM bk x
       |  JOIN kept k ON k.band = x.band AND k.key = x.key
       |  JOIN bk y ON y.band = x.band AND y.key = x.key
       |    AND x.doc_id < y.doc_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHam""".stripMargin
  }
}
