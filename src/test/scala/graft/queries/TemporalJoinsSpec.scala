package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.TemporalJoins

/** Semantics pins for the temporal join operators (q77/q78):
  * tie-at-equal-ts matches (`<=`), tiebreak largest-wins, unmatched-left
  * null payload, range boundary inclusivity, and cross-bucket straddle.
  */
class TemporalJoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def asof(
      left: Seq[(Long, Long, Long)],       // (oid, key, ts)
      right: Seq[(Long, Long, Long, Double)]) = { // (key, ts, eid, v)
    TemporalJoins.asofBackward(
      left.toDF("oid", "key", "t"),
      right.toDF("rkey", "t", "eid", "v"),
      leftKey = "key", rightKey = "rkey", leftTs = "t", rightTs = "t",
      payload = Seq("eid", "v"), tiebreak = "eid")
      .select("oid", "eid", "v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  test("asofBackward: latest at-or-before wins; equal ts matches; later excluded") {
    val m = asof(
      left = Seq((1L, 7L, 100L), (2L, 7L, 50L), (3L, 7L, 10L)),
      right = Seq((7L, 100L, 11L, 1.0), (7L, 60L, 12L, 1.0), (7L, 20L, 13L, 1.0)))
    assert(m(1L) === Some(11L)) // equal ts matches (<=)
    assert(m(2L) === Some(13L)) // 20 <= 50 < 60
    assert(m(3L) === None)      // nothing at or before 10
  }

  test("asofBackward: equal-ts right rows break ties by largest tiebreak") {
    val m = asof(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 40L, 5L, 1.0), (7L, 40L, 9L, 1.0), (7L, 40L, 2L, 1.0)))
    assert(m(1L) === Some(9L))
  }

  test("asofBackward: keys never cross; unmatched key yields null payload") {
    val m = asof(
      left = Seq((1L, 7L, 100L), (2L, 8L, 100L)),
      right = Seq((7L, 10L, 11L, 1.0)))
    assert(m(1L) === Some(11L))
    assert(m(2L) === None)
  }

  test("asofBackward result is deterministic across shuffle partitionings") {
    val left = (1L to 40L).map(i => (i, i % 3, i * 7 % 50))
    val right = (1L to 60L).map(i => (i % 3, i * 11 % 50, i, i.toDouble))
    val a = asof(left, right)
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(asof(left, right) === a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", sp)
  }

  private def range(
      left: Seq[(Long, Long, Long)],      // (oid, key, startUs)
      right: Seq[(Long, Long, Long)],     // (key, tsUs, eid)
      lenUs: Long, bucketUs: Long) = {
    TemporalJoins.rangeJoinAgg(
      left.toDF("oid", "key", "start_us"),
      right.toDF("rkey", "ts_us", "eid"),
      leftKey = "key", rightKey = "rkey",
      leftStartUs = "start_us", rightTsUs = "ts_us",
      lenUs = lenUs, bucketUs = bucketUs,
      leftId = Seq("oid"),
      aggs = Seq(count(col("eid")).as("n")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("rangeJoinAgg: [start, start+len) inclusive/exclusive boundaries") {
    val m = range(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 99L, 1L), (7L, 100L, 2L), (7L, 109L, 3L), (7L, 110L, 4L)),
      lenUs = 10L, bucketUs = 10L)
    assert(m(1L) === 2L) // 100 and 109 in; 99 and 110 out
  }

  test("rangeJoinAgg: interval straddling two buckets still sees both sides") {
    // start=95 len=10 covers [95,105): buckets 9 and 10 at width 10
    val m = range(
      left = Seq((1L, 7L, 95L)),
      right = Seq((7L, 96L, 1L), (7L, 104L, 2L), (7L, 105L, 3L), (7L, 94L, 4L)),
      lenUs = 10L, bucketUs = 10L)
    assert(m(1L) === 2L)
  }

  test("rangeJoinAgg: zero-match left rows survive with count 0") {
    val m = range(
      left = Seq((1L, 7L, 100L), (2L, 8L, 100L)),
      right = Seq((7L, 500L, 1L), (8L, 101L, 2L)),
      lenUs = 10L, bucketUs = 10L)
    assert(m === Map(1L -> 0L, 2L -> 1L))
  }

  test("rangeJoinAgg rejects len > bucket (would straddle >2 cells)") {
    intercept[IllegalArgumentException] {
      range(Seq((1L, 7L, 0L)), Seq((7L, 1L, 1L)), lenUs = 11L, bucketUs = 10L)
    }
  }
}
