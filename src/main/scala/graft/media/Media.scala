package graft.media

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (builder brief): image/audio/video travel
  * as opaque `binary` columns with TYPED metadata; decode/feature-extract/
  * resize/frame-sample run as per-partition BATCHED functions — the Scala
  * analog of PySpark's `mapInPandas` Pandas-UDF batches is
  * `mapPartitions` over a columnar-friendly row schema (Tungsten rows in,
  * one iterator per partition, no per-row lambda dispatch).
  *
  * The CODEC itself is stubbed — this container has no image/audio
  * libraries — behind [[DecodeStub]]: a deterministic fake that stands in
  * for libjpeg/ffmpeg and keeps every Spark-side contract real and
  * testable (schema, nullability, partitioning, batch iteration, feature
  * shapes, oracles). Payload bytes are md5-derived so DuckDB can
  * reproduce them bit-exactly (`from_hex(md5(...))`) and hash-gate the
  * whole pipeline.
  */
object Media {

  /** media table schema: (doc_id, kind, bytes, meta{width,height,
    * sample_rate, n_frames}) — kind ∈ image|audio|video by doc_id mod 3.
    */
  val KindSql = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  /** Deterministic payload: `rounds` chained md5 blocks of 16 bytes each
    * — `unhex(md5(seed || i))`, identical in DuckDB via
    * `from_hex(md5(...))`.
    */
  def payload(docId: Column, rounds: Int): Column =
    concat((0 until rounds).map(i =>
      unhex(md5(concat(docId.cast("string"), lit(s"#$i"))))): _*)

  def payloadSql(e: String, rounds: Int): String =
    (0 until rounds).map(i =>
      s"from_hex(md5(CAST($e AS VARCHAR) || '#$i'))").mkString("(", " || ", ")")

  /** Synthesize the media table from the documents table (TESTDATA.md —
    * driver parquet only; no external data). 4 md5 blocks = 64 bytes.
    */
  def synthesize(docs: DataFrame, rounds: Int = 4): DataFrame =
    docs.select(
      col("doc_id"),
      expr(KindSql).as("kind"),
      payload(col("doc_id"), rounds).as("bytes"),
      struct(
        (col("doc_id") % 8 + 1).cast("int").as("width"),
        (col("doc_id") % 6 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("doc_id") % 5 + 1).cast("int").as("n_frames")).as("meta"))

  /** THE DECODE STUB — where libjpeg/libsndfile/ffmpeg would run. The
    * deterministic fake "decodes" the payload as raw 8-bit samples. All
    * surrounding plumbing (batch iteration, feature schema) is real.
    */
  object DecodeStub {
    /** ??? real codec goes here ??? — fake decode: bytes AS the samples. */
    def decode(bytes: Array[Byte]): Array[Int] = bytes.map(_ & 0xff)
  }

  /** Feature extraction over the (stub-)decoded samples, batched per
    * partition: 16-bucket histogram + mean sample value per row.
    * Output: (doc_id, kind, hist: array<long> Γ16, mean_c: long — mean
    * ×100 floored, engine-order-independent).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // one pass per PARTITION (mapInPandas-batch analog): allocate the
        // histogram buffer once, reuse across the batch
        val hist = new Array[Long](16)
        batch.map { case (docId, kind, bytes) =>
          java.util.Arrays.fill(hist, 0L)
          val samples = DecodeStub.decode(bytes)
          var sum = 0L
          var i = 0
          while (i < samples.length) {
            hist(samples(i) >> 4) += 1L
            sum += samples(i)
            i += 1
          }
          val meanC = if (samples.isEmpty) 0L else sum * 100L / samples.length
          (docId, kind, hist.clone().toSeq, meanC)
        }
      }
      .toDF("doc_id", "kind", "hist", "mean_c")
  }

  /** Resize (images): nearest-neighbour on the fake w×h sample grid —
    * pure metadata + byte-slicing transform, no UDF; the real resample
    * would live in [[DecodeStub]].
    * Output keeps the binary column contract: (doc_id, bytes', meta').
    */
  def resize(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    // nearest-neighbour index map computed as a column expression over
    // the byte positions: out(y, x) = in(y*h/newH, x*w/newW)
    media.filter(col("kind") === "image").select(
      col("doc_id"),
      expr(
        s"""CAST(concat_ws('', transform(sequence(0, ${newH - 1}), y ->
           |  concat_ws('', transform(sequence(0, ${newW - 1}), x ->
           |    substring(bytes,
           |      CAST(CAST(y * meta.height AS INT) / $newH AS INT) * meta.width
           |        + CAST(CAST(x * meta.width AS INT) / $newW AS INT) + 1, 1)))))
           |AS BINARY)""".stripMargin.replace("\n", " ")).as("bytes"),
      struct(lit(newW).as("width"), lit(newH).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")).as("meta"))
  }

  /** Frame sampling (video): slice the payload into meta.n_frames equal
    * frames and keep every `every`-th — array<binary> via substring
    * arithmetic, fully columnar.
    */
  def frameSample(media: DataFrame, every: Int): DataFrame =
    media.filter(col("kind") === "video").select(
      col("doc_id"),
      expr(
        s"""filter(
           |  transform(sequence(0, meta.n_frames - 1), i ->
           |    CASE WHEN i % $every = 0 THEN substring(bytes,
           |      i * CAST(length(bytes) / meta.n_frames AS INT) + 1,
           |      CAST(length(bytes) / meta.n_frames AS INT)) END),
           |  f -> f IS NOT NULL)""".stripMargin.replace("\n", " "))
        .as("frames"))

  /** Near-dup media synthesis: groups of `groupSize` consecutive doc_ids
    * share the first 3 payload blocks (the "image content"); the 4th
    * block is per-doc (the "re-encode noise"). Gives every group
    * identical low 48 sample positions and ≤ 15 differing high ones —
    * a planted perceptual-near-dup corpus DuckDB reproduces from hex
    * (`from_hex(md5(...))`), no external data, no RNG.
    */
  def synthesizeNearDup(docs: DataFrame, groupSize: Int = 7): DataFrame =
    docs.select(col("doc_id"),
      concat((0 until 3).map(i =>
        unhex(md5(concat(lit("g"),
          expr(s"doc_id DIV $groupSize").cast("string"), lit(s"#$i"))))) :+
        unhex(md5(concat(lit("p"), col("doc_id").cast("string")))): _*)
        .as("bytes"))

  /** Average-hash (aHash) style 63-bit perceptual hash over the
    * (stub-)decoded samples: bit i = sample_i > 127 (fixed threshold —
    * bits stay independent, unlike mean-threshold aHash, so a k-sample
    * perturbation moves at most k bits). Runs as the same batched
    * `mapPartitions` decode path as [[extractFeatures]] — swapping
    * [[DecodeStub]] for a real codec changes nothing else.
    */
  def blockHash63(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val s = DecodeStub.decode(bytes)
        val n = math.min(63, s.length)
        var h = 0L
        var i = 0
        while (i < n) {
          if (s(i) > 127) h |= (1L << i)
          i += 1
        }
        (id, h)
      })
      .toDF("id", "sh")
  }

  /** Perceptual-hash near-dup pair extraction — the image-dedup scale
    * path (banded LSH over aHash bits, exact Hamming verify), sharing
    * [[graft.dedup.Dedup.hammingPairs]] with the text SimHash pipeline.
    * Full recall here comes from the synthesis construction: group
    * members differ only in the 15 personal-block bits, so bands 0-2
    * always collide (the caller contract hammingPairs documents).
    */
  def phashPairs(media: DataFrame, maxHam: Int = 15,
                 maxBucket: Int = 1000): DataFrame =
    graft.dedup.Dedup.hammingPairs(
      blockHash63(media), maxHam, bands = 4, maxBucket = maxBucket)
}
