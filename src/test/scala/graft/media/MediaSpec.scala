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
}
