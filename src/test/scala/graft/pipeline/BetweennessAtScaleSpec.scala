package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.graph.LocalPaths
import graft.geo.Geo

/** Pins the betweenness scale path (DistContract step-1 + simplify +
  * run-decomposed chain weights) against the exact single-task port:
  * identical topology/chains/samples and values to 1e-9 relative (the fp
  * association of merged-chain weights differs at the ulp) on
  * CONFLICT-FREE groups — trees AND cycles whose contraction never hits
  * a duplicate/self-loop skip — and, on conflicting cycles (where the
  * reference's own contraction is merge-order-dependent), pins the
  * documented midpoint-split semantics: no guard trip, a simple pillar
  * graph, exact-once coverage of every original edge by the emitted
  * chains, and Brandes values that replay from the emitted topology.
  */
class BetweennessAtScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** comp 1: chain-heavy random tree; comp 2: conflict-free cyclic — a
    * triangle of three long chains between corners 200/240/280 (each
    * corner degree 3 via a spur), so full contraction creates three
    * DISTINCT corner-corner edges and both forms agree exactly.
    */
  private def fixture(seed: Long): (Seq[(Long, Long, Long)], Seq[(Long, Double, Double)]) = {
    val rng = new scala.util.Random(seed)
    val tree = (1 until 80).map { i =>
      val p = if (i == 1) 0 else rng.nextInt(math.max(1, i / 2))
      (1L, p.toLong, i.toLong)
    }
    val tri = (201 to 240).map(i => (2L, i.toLong - 1L, i.toLong)) ++
      (241 to 280).map(i => (2L, i.toLong - 1L, i.toLong)) ++
      (281 to 319).map(i => (2L, i.toLong - 1L, i.toLong)) ++
      Seq((2L, 319L, 200L),
        (2L, 200L, 900L), (2L, 240L, 901L), (2L, 280L, 902L))
    val edges = tree ++ tri
    val verts = edges.flatMap(e => Seq(e._2, e._3)).distinct
    val pos = verts.map(v =>
      (v, rng.nextDouble() * 10 - 5, rng.nextDouble() * 10 - 5))
    (edges, pos)
  }

  /** Conflicting cyclic group: a 30-node ring with one chord — full
    * contraction yields three parallel pillar chains (205↔218). */
  private def ringChord: Seq[(Long, Long, Long)] =
    (201 until 230).map(i => (3L, i.toLong - 1L, i.toLong)) ++
      Seq((3L, 229L, 200L), (3L, 205L, 218L))

  private def run(
      edges: Seq[(Long, Long, Long)], pos: Seq[(Long, Double, Double)],
      threshold: Long)
      : Map[(Long, Long, Long), (Seq[Long], Double, Double, Double, Double)] = {
    Extras.betweennessGrouped(
        edges.toDF("comp", "src", "dst"),
        pos.toDF("nid", "lat", "lon"), spark,
        maxSamples = 40, sizeThreshold = threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getSeq[Long](3).toSeq, r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))))
      .toMap
  }

  private def close(x: Double, y: Double) =
    math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))

  private def assertClose(
      a: Map[(Long, Long, Long), (Seq[Long], Double, Double, Double, Double)],
      b: Map[(Long, Long, Long), (Seq[Long], Double, Double, Double, Double)]): Unit = {
    assert(a.keySet == b.keySet) // identical edge topology
    a.foreach { case (k, (ch, v, f, fm, mx)) =>
      val (ch2, v2, f2, fm2, mx2) = b(k)
      assert(ch == ch2, s"chain differs at $k")
      assert(close(v, v2) && close(f, f2) && close(fm, fm2) && close(mx, mx2),
        s"values differ at $k: ($v,$f,$fm,$mx) vs ($v2,$f2,$fm2,$mx2)")
    }
  }

  test("scale path ≡ exact port on trees and conflict-free cycles") {
    for (seed <- Seq(3L, 17L)) {
      val (edges, pos) = fixture(seed)
      val local = run(edges, pos, Long.MaxValue)
      val hybrid = run(edges, pos, 1L) // both comps → scale path
      assert(local.nonEmpty && local.keySet.exists(_._1 == 2L),
        "fixture must emit rows for the cyclic group too")
      assertClose(local, hybrid)
    }
  }

  test("conflicting cyclic group: scale path, no guard, midpoint-split semantics") {
    val edges = ringChord
    val rng = new scala.util.Random(11L)
    val pos = edges.flatMap(e => Seq(e._2, e._3)).distinct.map(v =>
      (v, rng.nextDouble() * 10 - 5, rng.nextDouble() * 10 - 5))
    // threshold=1: the 31-edge cyclic group exceeds it → scale path (the
    // round-4 gate would have routed it local; at real scale that was the
    // loud boundedSeq ceiling)
    val out = run(edges, pos, 1L)
    assert(out.nonEmpty)
    // simple pillar graph: 3 parallel 205↔218 chains → chord kept + two
    // arcs each split at the midpoint → 5 edges, every edge emitted
    assert(out.size == 5, s"expected 5 pillar edges, got ${out.keySet}")
    // exact-once coverage: chains expand back to the original edge set
    val covered = out.keys.toSeq.flatMap { k =>
      out(k)._1.sliding(2).map(p => (math.min(p(0), p(1)), math.max(p(0), p(1))))
    }
    val original = edges.map(e => (math.min(e._2, e._3), math.max(e._2, e._3)))
    assert(covered.sorted == original.sorted,
      "emitted chains must cover every original edge exactly once")
    // values replay: Brandes over the emitted topology with sliding-chain
    // weights and the same sampler must reproduce the reported values
    val posMap: LocalPaths.Pos = pos.map(p => p._1 -> (p._2, p._3)).toMap
    val adj = out.toSeq
      .flatMap { case ((_, a, b), (ch, _, _, _, _)) =>
        val w = ch.sliding(2).map { case Seq(x, y) =>
          Geo.haversineM(posMap(x)._1, posMap(x)._2, posMap(y)._1, posMap(y)._2)
        }.sum
        Seq(a -> (b, w), b -> (a, w))
      }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(x => (x._2, x._1))).toMap
    val verts = out.keys.toSeq.flatMap(k => Seq(k._2, k._3)).distinct.sorted
    val samples = LocalPaths.farthestPointSample(verts, posMap, verts.length)
    val expect = LocalPaths.betweennessWeighted(adj, samples)
    out.foreach { case ((_, a, b), (_, v, _, _, _)) =>
      assert(close(v, expect((a, b))),
        s"value at ($a,$b): scale=$v replay=${expect((a, b))}")
    }
  }

  test("scale path is parallelism-invariant (bit-identical)") {
    val (edges0, pos0) = fixture(7L)
    val rng = new scala.util.Random(23L)
    val extraPos = ringChord.flatMap(e => Seq(e._2, e._3)).distinct
      .filterNot(pos0.map(_._1).toSet)
      .map(v => (v, rng.nextDouble() * 10 - 5, rng.nextDouble() * 10 - 5))
    val edges = edges0 ++ ringChord
    val pos = pos0 ++ extraPos
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    def at(p: String) = try {
      spark.conf.set("spark.sql.shuffle.partitions", p); run(edges, pos, 1L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    assert(at("1") == at("9"))
  }
}
