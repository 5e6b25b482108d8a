package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the betweenness tree scale path (DistContract step-1 +
  * run-decomposed chain weights) against the exact single-task port:
  * identical topology/chains/samples, values to 1e-9 relative (the fp
  * association of merged-chain weights differs at the ulp), and the
  * router sends non-tree groups down the exact port regardless of size.
  */
class BetweennessAtScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** comp 1: chain-heavy random tree; comp 2: cyclic (non-tree). */
  private def fixture(seed: Long): (Seq[(Long, Long, Long)], Seq[(Long, Double, Double)]) = {
    val rng = new scala.util.Random(seed)
    val tree = (1 until 80).map { i =>
      val p = if (i == 1) 0 else rng.nextInt(math.max(1, i / 2))
      (1L, p.toLong, i.toLong)
    }
    val cyc = (201 until 230).map(i => (2L, i.toLong - 1L, i.toLong)) ++
      Seq((2L, 229L, 200L), (2L, 205L, 218L))
    val edges = tree ++ cyc
    val verts = edges.flatMap(e => Seq(e._2, e._3)).distinct
    val pos = verts.map(v =>
      (v, rng.nextDouble() * 10 - 5, rng.nextDouble() * 10 - 5))
    (edges, pos)
  }

  private def run(seed: Long, threshold: Long)
      : Map[(Long, Long, Long), (Seq[Long], Double, Double, Double, Double)] = {
    val (edges, pos) = fixture(seed)
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

  private def assertClose(
      a: Map[(Long, Long, Long), (Seq[Long], Double, Double, Double, Double)],
      b: Map[(Long, Long, Long), (Seq[Long], Double, Double, Double, Double)]): Unit = {
    assert(a.keySet == b.keySet) // identical edge topology
    def close(x: Double, y: Double) =
      math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    a.foreach { case (k, (ch, v, f, fm, mx)) =>
      val (ch2, v2, f2, fm2, mx2) = b(k)
      assert(ch == ch2, s"chain differs at $k")
      assert(close(v, v2) && close(f, f2) && close(fm, fm2) && close(mx, mx2),
        s"values differ at $k: ($v,$f,$fm,$mx) vs ($v2,$f2,$fm2,$mx2)")
    }
  }

  test("tree scale path ≡ exact port; non-tree group routes local") {
    for (seed <- Seq(3L, 17L)) {
      val local = run(seed, Long.MaxValue)
      val hybrid = run(seed, 1L) // tree comp → scale; cyclic comp → local
      assert(local.nonEmpty && local.keySet.exists(_._1 == 2L),
        "fixture must emit rows for the cyclic group too")
      assertClose(local, hybrid)
    }
  }

  test("scale path is parallelism-invariant (bit-identical)") {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    def at(p: String) = try {
      spark.conf.set("spark.sql.shuffle.partitions", p); run(7L, 1L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    assert(at("1") == at("9"))
  }
}
