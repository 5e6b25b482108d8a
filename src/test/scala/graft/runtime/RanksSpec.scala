package graft.runtime

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins [[Ranks.withPairGroupMinRank]] (the one-exchange densify of the
  * suffix-array doubling loop) against the naive reference
  * (global row_number → groupBy(k1,k2).min → join back) on fixtures
  * engineered so rank classes SPAN range-partition boundaries — the
  * carry-chaining path that a single-partition toy input never hits.
  */
class RanksSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Naive reference: same total order, two extra shuffles. */
  private def reference(
      df: org.apache.spark.sql.DataFrame): Map[(Long, Long, Long), Long] = {
    val rn = Ranks.withGlobalRowNumber(
      df, Seq(col("k1").asc, col("k2").asc, col("tie").asc), "__rn")
    val classes = rn.groupBy("k1", "k2").agg(min("__rn").as("mn"))
    rn.join(classes, Seq("k1", "k2"))
      .collect()
      .map(r => (r.getAs[Long]("k1"), r.getAs[Long]("k2"),
        r.getAs[Long]("tie")) -> r.getAs[Long]("mn"))
      .toMap
  }

  private def check(rows: Seq[(Long, Long, Long)]): Boolean = {
    val df = rows.toDF("k1", "k2", "tie")
    val (got, allD) = Ranks.withPairGroupMinRank(
      df, "k1", "k2", Seq(col("tie").asc), "r")
    val gotMap = got.collect()
      .map(r => (r.getAs[Long]("k1"), r.getAs[Long]("k2"),
        r.getAs[Long]("tie")) -> r.getAs[Long]("r"))
      .toMap
    assert(gotMap == reference(df.toDF()), s"mismatch on ${rows.take(5)}…")
    allD
  }

  test("fat classes spanning range-partition boundaries (carry path)") {
    // 400 rows, 4 classes of 100 — with shuffle.partitions=4 every
    // class straddles at least one boundary; group-min rank must be
    // carried across partitions.
    val rows = (0L until 400L).map(i => (i / 100L, 0L, i))
    assert(!check(rows)) // not all distinct
  }

  test("one giant class across ALL partitions (multi-partition carry)") {
    val rows = (0L until 300L).map(i => (7L, 7L, i))
    assert(!check(rows))
  }

  test("all-distinct keys → allDistinct convergence signal") {
    val rows = (0L until 200L).map(i => (i, i * 3L, i))
    assert(check(rows))
  }

  test("mixed: singletons, boundary-spanning runs, adversarial order") {
    // interleave fat runs with singletons, shuffled input order
    val fat = (0L until 120L).map(i => (5L, 1L, i))
    val singles = (0L until 97L).map(i => (i * 2L + 1000L, i, i + 500L))
    val rows = new scala.util.Random(42).shuffle(fat ++ singles)
    assert(!check(rows))
  }

  test("empty input") {
    val df = Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "tie")
    val (got, allD) = Ranks.withPairGroupMinRank(
      df, "k1", "k2", Seq(col("tie").asc), "r")
    assert(got.count() == 0L && allD)
  }
}
