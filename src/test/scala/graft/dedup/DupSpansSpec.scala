package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Overlapping duplicate-span detection (q75): stride-1 windows catch a
  * copied block at ANY offset — including offsets the non-overlapping
  * passage grid (q66) misses.
  */
class DupSpansSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val block = (1 to 12).map(i => s"b$i").mkString(" ")

  test("a copied 12-token block is flagged in both docs at a non-aligned offset") {
    // doc 2 repeats the block after a 3-token prefix — 3 is not a
    // multiple of the passage width, so q66's fixed grid sees no
    // duplicate passage, while stride-1 spans must.
    val docs = Seq(
      (1L, block + " tail1 tail2"),
      (2L, "p1 p2 p3 " + block),
      (3L, (1 to 30).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")

    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", w = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the 12-token block contains 3 distinct 10-grams; all are shared
    assert(spans(1L)._2 == 3 && spans(2L)._2 == 3)
    assert(spans(1L)._3 == 2 && spans(2L)._3 == 2)
    assert(spans(3L)._2 == 0 && spans(3L)._3 == 1)

    val passages = Dedup.passageDedup(docs, "doc_id", "text", w = 10)
      .filter(col("n_dup_pass") > 0).count()
    assert(passages == 0, "the fixed passage grid misses the offset copy")
  }

  test("span counts are per-doc distinct windows") {
    // 'x x x ... x' (15 tokens): 6 windows, all the same 10-gram
    val docs = Seq((1L, Seq.fill(15)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Dedup.duplicateSpans(docs, "doc_id", "text", w = 10).head()
    assert(r.getLong(1) == 1 && r.getLong(2) == 0 && r.getLong(3) == 1)
  }
}
