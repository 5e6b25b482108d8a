package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.pipeline.LumpWays

/** q119 wires the DistPeel sharded-geometry path through the driver's
  * DuckDB gate. This spec pins the two prerequisites the oracle can't
  * see: (1) at q119's threshold (1) the sf0.01 verify fixture actually
  * CROSSES the shard gate (sharded components emit one LineString row
  * per stitched segment, so the feature row count strictly exceeds the
  * exact path's one-row-per-component — sf0.001 components are all
  * single contracted ways and can never cross it), and (2) the q119
  * digest is peel-invariant — sharded ≡ exact bit-for-bit, so the DuckDB
  * replay gates the sharded output specifically.
  */
class ShardGateSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private def cfg(threshold: Long) = LumpWays.Config(
    tagFilters = Seq(graft.tagfilter.TagFilter.unsafeParse("status")),
    groupKeys = Seq(Seq("status")),
    shardThresholdEdges = threshold)

  test("q119's threshold engages the sharded path on the verify fixture") {
    val ways = Derived.waysDF(spark, dir)
    val nodes = Derived.nodesDF(spark, dir)
    val sharded = LumpWays.features(ways, nodes, cfg(1L), spark).count()
    val exact = LumpWays.features(ways, nodes, cfg(Long.MaxValue), spark).count()
    assert(sharded > exact,
      s"no per-segment rows at threshold 1 ($sharded vs $exact) — " +
        "the sharded path did not run; q119 would gate nothing")
  }

  test("q119 digest: sharded ≡ exact (peel-invariant coverage)") {
    def digest(threshold: Long) =
      QueriesGraph.shardedGeomDigest(spark, dir, threshold)
        .collect().map(_.toSeq.toList).toSet
    val a = digest(1L)
    assert(a.nonEmpty)
    assert(a == digest(Long.MaxValue))
  }
}
