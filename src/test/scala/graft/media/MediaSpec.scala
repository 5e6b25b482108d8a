package graft.media

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Multimodal plumbing: binary columns, typed metadata, batched stub
  * decode, columnar resize and frame sampling.
  */
class MediaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (6L, "e"))
    .toDF("doc_id", "text")

  test("synthesize: schema, kinds, deterministic payload") {
    val m = Media.synthesize(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    val kinds = m.select("doc_id", "kind").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(kinds(0L) == "image" && kinds(1L) == "audio" && kinds(2L) == "video")
    val b = m.filter(col("doc_id") === 1L).select("bytes").head().getAs[Array[Byte]](0)
    assert(b.length == 64)
    // payload block 0 = md5("1#0") bytes
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("1#0".getBytes("UTF-8"))
    assert(b.take(16).toSeq == expected.toSeq)
  }

  test("extractFeatures: histogram + mean agree with a local recompute") {
    val m = Media.synthesize(docs)
    val f = Media.extractFeatures(m).collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](2), r.getLong(3)))).toMap
    val bytes = m.select("doc_id", "bytes").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    for ((id, bs) <- bytes) {
      val samples = bs.map(_ & 0xff)
      val hist = new Array[Long](16)
      samples.foreach(s => hist(s >> 4) += 1)
      assert(f(id)._1 == hist.toSeq, s"hist mismatch for $id")
      assert(f(id)._2 == samples.map(_.toLong).sum * 100 / samples.length)
    }
    // batch shape: features preserve the input partitioning (mapPartitions
    // is narrow — no shuffle inserted)
    val plan = Media.extractFeatures(m).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode batch should be narrow:\n$plan")
  }

  test("resize: nearest-neighbour grid on the fake decode, meta updated") {
    val m = Media.synthesize(docs)
    val r = Media.resize(m, 2, 2)
    val row = r.filter(col("doc_id") === 0L).head()
    val out = row.getAs[Array[Byte]]("bytes")
    assert(out.length == 4)
    assert(row.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 2)
    // doc 0: w=1, h=1 → all four samples = in(0,0) = bytes[0]
    val src = m.filter(col("doc_id") === 0L).select("bytes").head().getAs[Array[Byte]](0)
    assert(out.toSeq == Seq(src(0), src(0), src(0), src(0)))
  }

  test("frameSample: every k-th equal slice of the payload") {
    val m = Media.synthesize(docs)
    // doc 2: video, n_frames = 2 % 5 + 1 = 3 → frames of 21 bytes, every 2nd
    val frames = Media.frameSample(m, 2)
      .filter(col("doc_id") === 2L)
      .head().getSeq[Array[Byte]](1)
    val src = m.filter(col("doc_id") === 2L).select("bytes").head().getAs[Array[Byte]](0)
    assert(frames.length == 2) // frames 0 and 2
    assert(frames(0).toSeq == src.slice(0, 21).toSeq)
    assert(frames(1).toSeq == src.slice(42, 63).toSeq)
  }

  test("phashPairs: every in-group pair found, hamming confined to personal bits") {
    val spark2 = spark
    import spark2.implicits._
    val ids = (0L until 21L).toDF("doc_id") // 3 full groups of 7
    val m = Media.synthesizeNearDup(ids)
    val hs = Media.blockHash63(m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // group members share bits 0..47 exactly (payload blocks 0-2)
    for (g <- 0L until 3L; a <- 0L until 7L; b <- 0L until 7L if a < b) {
      val (ha, hb) = (hs(g * 7 + a), hs(g * 7 + b))
      assert((ha & 0xFFFFFFFFFFFFL) == (hb & 0xFFFFFFFFFFFFL))
      assert(java.lang.Long.bitCount(ha ^ hb) <= 15)
    }
    val got = Media.phashPairs(m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // expected = brute force over the hashes at the same threshold
    val expect = (for {
      a <- 0L until 21L; b <- 0L until 21L if a < b
      h = java.lang.Long.bitCount(hs(a) ^ hs(b))
      if h <= 15 &&
        (0 until 4).exists(k => ((hs(a) >> (16 * k)) & 0xFFFFL) ==
          ((hs(b) >> (16 * k)) & 0xFFFFL))
    } yield (a, b) -> h.toLong).toMap
    assert(got == expect)
    // all 63 in-group pairs are present (recall by construction)
    assert((for (g <- 0L until 3L; a <- 0L until 7L; b <- 0L until 7L
                 if a < b) yield (g * 7 + a, g * 7 + b))
      .forall(got.contains))
  }
}
