package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the SemDeDup operator (q73): integer-exact k-means clustering +
  * within-cluster cosine CC collapse.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // two tight pairs on orthogonal axes + one far singleton
  private def emb = Seq(
    (1L, Array(1.0, 0.0)),
    (2L, Array(0.999, 0.0015)),   // cosine(1,2) ≈ 0.999999 ≥ 0.99
    (10L, Array(0.0, 1.0)),
    (11L, Array(0.0015, 0.999)),
    (20L, Array(0.7, 0.7)))       // cosine to either axis ≈ 0.707 < 0.99
    .toDF("vec_id", "v")

  private def run(k: Int) =
    Dedup.semanticDedup(emb, "vec_id", "v", k = k, iters = 2,
      tauE6 = 990000L)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("k=2: tight pairs collapse onto min id, far vector survives alone") {
    val r = run(2)
    assert(r.keySet == Set(1L, 2L, 10L, 11L, 20L))
    // (cluster, survivor, comp_size, is_survivor)
    assert(r(1L)._1 == r(2L)._1)   // near-identical vectors co-cluster
    assert(r(10L)._1 == r(11L)._1)
    assert((r(1L)._2, r(1L)._3, r(1L)._4) == ((1L, 2L, 1L)))
    assert((r(2L)._2, r(2L)._3, r(2L)._4) == ((1L, 2L, 0L)))
    assert((r(10L)._2, r(10L)._3, r(10L)._4) == ((10L, 2L, 1L)))
    assert((r(11L)._2, r(11L)._3, r(11L)._4) == ((10L, 2L, 0L)))
    assert((r(20L)._2, r(20L)._3, r(20L)._4) == ((20L, 1L, 1L)))
  }

  test("k=4 over 3 distinct positions: empty-cluster path, survivors") {
    // exact duplicates: two seeds coincide, so one cluster drains empty
    // (argmin ties → lowest index) and identical vectors ALWAYS
    // co-assign — k > #groups cannot split them (unlike near-dups,
    // which can straddle clusters when both become seeds)
    val dup = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0)),
      (10L, Array(0.0, 1.0)), (11L, Array(0.0, 1.0)),
      (20L, Array(0.7, 0.7))).toDF("vec_id", "v")
    val r = Dedup.semanticDedup(dup, "vec_id", "v", k = 4, iters = 2,
      tauE6 = 990000L)
      .collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r(1L)._1 == r(2L)._1 && r(10L)._1 == r(11L)._1)
    assert(r.values.map(_._2).toSet == Set(1L, 10L, 20L))
    assert(r.values.count(_._4 == 1L) == 3)
  }

  test("quantArgMin: exact integer L2, ties to the lowest index") {
    val cs = Array(Array(0L, 0L), Array(4L, 0L), Array(0L, 4L))
    assert(Dedup.quantArgMin(Array(1L, 0L), cs) == 0)
    assert(Dedup.quantArgMin(Array(3L, 0L), cs) == 1)
    // (2,0): dist 4 to both c0 and c1 → lowest index wins
    assert(Dedup.quantArgMin(Array(2L, 0L), cs) == 0)
    // (2,2): dist 8 to c0, 8 to c1, 8 to c2 → index 0
    assert(Dedup.quantArgMin(Array(2L, 2L), cs) == 0)
    // length mismatch → unassignable
    assert(Dedup.quantArgMin(Array(1L), cs) == -1)
  }
}
