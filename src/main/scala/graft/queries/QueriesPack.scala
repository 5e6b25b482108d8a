package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Training-sequence shaping ops over the documents table:
  *
  *  - q80 sliding context-window chunking: per document, fixed-width
  *    token windows with overlap (stride < width) — the retrieval /
  *    long-doc-training chunker. Pure per-row closed form
  *    (`explode(sequence)`), embarrassingly parallel.
  *  - q81 GPT-style sequence packing: documents concatenated in
  *    doc_id order into one global token stream, cut every `SeqLen`
  *    tokens; each document maps to the training sequences its token
  *    span intersects. The only global state is an exact-integer
  *    prefix sum ([[graft.runtime.Ranks.withGlobalCumsumLong]] — range
  *    exchange + partition-local windows, no single-partition stage),
  *    then the row explodes to its <= 1 + n/SeqLen covering sequences.
  *
  * Token counts are the engine-wide whitespace tokenizer
  * ([[TextOps.tokenCount]]) with its DuckDB-parity spelling.
  */
object QueriesPack {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val duckTokens =
    "list_filter(string_split(text, ' '), x -> x <> '')"

  private val ChunkW = 128L  // window tokens
  private val ChunkS = 96L   // stride tokens (overlap = 32)
  private val SeqLen = 256L  // packed training-sequence length
  private val ShardSize = 1000L  // q88 docs per training shard

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_chunk_windows" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n"))
        .withColumn("nchunks",
          when(col("n") <= ChunkW, lit(1L))
            .otherwise(expr(s"(n - ${ChunkW}L + ${ChunkS - 1}L) DIV ${ChunkS}L") + 1L))
        .select(col("doc_id"), col("n"),
          explode(sequence(lit(0L), col("nchunks") - 1L)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * ChunkS).as("tok_start"),
          least(lit(ChunkW), col("n") - col("chunk_idx") * ChunkS).as("tok_len"))),

    "q81_seq_pack" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n"))
      graft.runtime.Ranks
        .withGlobalCumsumLong(docs, Seq(col("doc_id")), col("n"), "c")
        .filter(col("n") > 0)
        .withColumn("g", col("c") - col("n"))
        .withColumn("seq_id",
          explode(sequence(expr(s"g DIV ${SeqLen}L"), expr(s"(c - 1L) DIV ${SeqLen}L"))))
        .select(col("doc_id"), col("seq_id"),
          (greatest(col("g"), col("seq_id") * SeqLen) - col("g")).as("doc_off"),
          (least(col("c"), (col("seq_id") + 1L) * SeqLen) -
            greatest(col("g"), col("seq_id") * SeqLen)).as("n_tok"))
    }),

    // q88 deterministic global shuffle → fixed-size shards: content-hash
    // order (pure function of the data, no RNG), two-phase global
    // row_number — never a single-partition Window
    "q88_shuffle_shards" -> ((s, d) =>
      TextOps.shuffleShards(t(s, d, "documents"), "doc_id", "text",
        ShardSize)))

  val oracles: Map[String, String] = Map(
    "q80_chunk_windows" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len($duckTokens) AS BIGINT) AS n
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n,
         |    CASE WHEN n <= $ChunkW THEN 1
         |         ELSE (n - $ChunkW + ${ChunkS - 1}) // $ChunkS + 1 END AS nchunks
         |  FROM t),
         |x AS (
         |  SELECT doc_id, n, UNNEST(range(0, nchunks)) AS chunk_idx FROM c)
         |SELECT doc_id, chunk_idx,
         |  chunk_idx * $ChunkS AS tok_start,
         |  LEAST($ChunkW, n - chunk_idx * $ChunkS) AS tok_len
         |FROM x""".stripMargin,

    "q81_seq_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len($duckTokens) AS BIGINT) AS n
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n,
         |    CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS c
         |  FROM t),
         |e AS (
         |  SELECT doc_id, n, c, c - n AS g FROM c WHERE n > 0),
         |x AS (
         |  SELECT doc_id, g, c,
         |    UNNEST(range(g // $SeqLen, (c - 1) // $SeqLen + 1)) AS seq_id
         |  FROM e)
         |SELECT doc_id, seq_id,
         |  GREATEST(g, seq_id * $SeqLen) - g AS doc_off,
         |  LEAST(c, (seq_id + 1) * $SeqLen) - GREATEST(g, seq_id * $SeqLen) AS n_tok
         |FROM x""".stripMargin,

    // q88: same md5h32(id ':' text) hash; (h, doc_id) is a total order
    // so ROW_NUMBER is unambiguous in both engines
    "q88_shuffle_shards" -> {
      val h = graft.dedup.Dedup.md5h32Sql(
        "CAST(doc_id AS VARCHAR) || ':' || text")
      s"""WITH h AS (SELECT doc_id, $h AS h FROM documents),
         |r AS (
         |  SELECT doc_id, h,
         |    ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rn
         |  FROM h)
         |SELECT doc_id, h,
         |  (rn - 1) // $ShardSize AS shard,
         |  (rn - 1) % $ShardSize AS pos
         |FROM r""".stripMargin
    })
}
