package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.text.TextOps

/** Pins the tokenizer/model-filter operators: BPE merge-pair counting
  * (q102), the hashed-linear classifier (q104), and the count-min
  * sketch (q105).
  */
class TokenizerOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bpePairCounts: hand-computed pair table, overlapping positions count") {
    val docs = Seq("aa ab", "aab aa", "aaa").toDF("text")
    val got = TextOps.bpePairCounts(docs, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // words: aa×2, ab×1, aab×1, aaa×1
    // "aa": word aa (1 pair × cnt 2) + aab pos1 (×1) + aaa pos1,2 (×2) = 5
    // "ab": word ab (×1) + aab pos2 (×1) = 2
    assert(got == Map(
      "aa" -> ((5L, 3L)), // distinct words containing: aa, aab, aaa
      "ab" -> ((2L, 2L))))
    // single-char and empty words contribute nothing
    val lone = TextOps.bpePairCounts(Seq("a b  c", "").toDF("text"), "text")
    assert(lone.count() == 0L)
  }

  test("hashClassifier ≡ HOF fold over md5h63 token buckets") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, ""),
      (2L, "  padded   tokens  "),
      (3L, "unicode tökens ünd ümlauts"),
      (4L, "x")).toDF("doc_id", "text")
    val got = TextOps.hashClassifier(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expect = docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"),
        aggregate(Dedup.tokenHashes63(col("text")), lit(0L),
          (a, h) => a + (pmod(h, lit(4096L)) % 2001L - 1000L)).as("s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.getLong(2) > 0L) 1L else 0L))).toMap
    assert(got == expect)
    assert(got(1L) == ((0L, 0L, 0L))) // empty text scores 0, dropped
  }

  test("countMinSketch: row sums = token occurrences, estimates bound counts") {
    val docs = Seq("a b a c", "b a", "d d d").toDF("text")
    val sk = TextOps.countMinSketch(docs, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totalToks = 9L
    for (r <- 0L to 3L)
      assert(sk.filter(_._1._1 == r).values.sum == totalToks,
        s"row $r mass")
    // point estimate (min over rows) is >= the true count for every token
    val truth = Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 3L)
    truth.foreach { case (tok, cnt) =>
      val est = (0 until 4).map { r =>
        val colId = Seq(tok).toDF("tok")
          .select(pmod(Dedup.md5h63(concat(lit(s"$r:"), col("tok"))),
            lit(1024L))).head.getLong(0)
        sk.getOrElse((r.toLong, colId), 0L)
      }.min
      assert(est >= cnt, s"estimate($tok)")
    }
    // pure function of the data: partitioning never changes the sketch
    val re = TextOps.countMinSketch(docs.repartition(7), "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(re == sk)
  }
}
