package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins DistContract: tree parity with Local.compress, the expansion
  * invariant on cyclic graphs, cycle/self-loop semantics, keep-set
  * preservation, and parallelism invariance.
  */
class DistContractSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def contract(
      edges: Seq[(Long, Long, Long)],
      keep: Seq[(Long, Long)]): Set[(Long, Long, Long, Seq[Long])] =
    DistContract.contract(
        edges.toDF("comp", "src", "dst"),
        keep.toDF("comp", "nid"), spark)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toSeq))
      .toSet

  /** Seeded random tree on nids [base, base+n): node i attaches to a
    * random earlier node — chain-heavy for small fan-out.
    */
  private def randomTree(base: Long, n: Int, seed: Long): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    (1 until n).map { i =>
      val p = if (i == 1) 0 else rng.nextInt(math.max(1, i / 3)) // deep chains
      (base + p, base + i)
    }
  }

  test("tree parity: contract(keep=∅) == Local.compress on random trees") {
    for (seed <- Seq(1L, 7L, 23L)) {
      val es = randomTree(1000 * seed, 60, seed)
      val got = contract(es.map(e => (1L, e._1, e._2)), Nil)
        .map { case (_, a, b, iv) => (a, b, iv) }
      val want = Local.compress(
        es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2),
          Seq.empty[Long])), _ => false)
        .map { case (a, b, iv) => (a, b, iv) }.toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("expansion invariant: contracted edges expand back to the input") {
    val rng = new scala.util.Random(5)
    // random tree + extra edges → cycles, diamonds, parallel chains
    val tree = randomTree(0, 80, 5)
    val extra = Seq.fill(12)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val es = tree ++ extra
    val canon = es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val out = contract(es.map(e => (1L, e._1, e._2)), Nil)
    val expanded = out.toSeq.flatMap { case (_, a, b, iv) =>
      (a +: iv :+ b).sliding(2)
        .map(p => (math.min(p(0), p(1)), math.max(p(0), p(1))))
    }.toSet
    assert(expanded == canon)
    // no interior node is a pillar: every inter nid has degree exactly 2
    val deg = canon.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    out.foreach { case (_, _, _, iv) =>
      iv.foreach(n => assert(deg(n) == 2, s"inter $n deg ${deg(n)}"))
    }
  }

  test("keep nodes survive as endpoints, never as interiors") {
    // one long chain 0-1-2-...-9; keep node 5
    val es = (0L until 9L).map(i => (1L, i, i + 1))
    val out = contract(es, Seq((1L, 5L)))
    assert(out == Set(
      (1L, 0L, 5L, Seq(1L, 2L, 3L, 4L)),
      (1L, 5L, 9L, Seq(6L, 7L, 8L))))
  }

  test("pure cycle → one self-loop row at the least nid, ordered interior") {
    val cyc = Seq((1L, 10L, 11L), (1L, 11L, 12L), (1L, 12L, 13L),
      (1L, 13L, 10L))
    assert(contract(cyc, Nil) == Set((1L, 10L, 10L, Seq(11L, 12L, 13L))))
    // cycle through one PILLAR (node 20 also has a spur): self-loop at 20
    val lolly = Seq((1L, 20L, 21L), (1L, 21L, 22L), (1L, 22L, 20L),
      (1L, 20L, 30L))
    assert(contract(lolly, Nil) == Set(
      (1L, 20L, 20L, Seq(21L, 22L)),
      (1L, 20L, 30L, Seq())))
  }

  test("parallel chains between one pillar pair stay two multigraph rows") {
    // diamond: two chains 0-1-2-9 and 0-3-9 between pillars 0 and 9
    // (0 and 9 get degree 2 — pin them via keep, as frames' hull does)
    val es = Seq((1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 9L),
      (1L, 0L, 3L), (1L, 3L, 9L))
    val out = contract(es, Seq((1L, 0L), (1L, 9L)))
    assert(out == Set(
      (1L, 0L, 9L, Seq(1L, 2L)),
      (1L, 0L, 9L, Seq(3L))))
  }

  test("groups sharing node ids contract independently (packed chain keys)") {
    // the SAME chain 0-1-...-9 in two way groups, plus a spur in group 2
    // that changes its pillar set — a nid-keyed chain CC would merge the
    // two groups' chains and blow up the per-chain walk
    val chain = (0L until 9L).map(i => (i, i + 1))
    val es = chain.map(e => (1L, e._1, e._2)) ++
      chain.map(e => (2L, e._1, e._2)) :+ ((2L, 5L, 50L))
    val out = contract(es, Nil)
    assert(out == Set(
      (1L, 0L, 9L, (1L to 8L)),
      (2L, 0L, 5L, (1L to 4L)),
      (2L, 5L, 9L, (6L to 8L)),
      (2L, 5L, 50L, Seq())))
  }

  private def simplify(
      rows: Seq[(Long, Long, Long, Seq[Long])]): Set[(Long, Long, Long, Seq[Long])] =
    DistContract.simplify(rows.toDF("comp", "src", "dst", "inter"), spark)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toSeq))
      .toSet

  test("simplify: identity on simple rows, midpoint split on conflicts") {
    // simple rows pass through
    val tree = Seq((1L, 0L, 9L, Seq(1L, 2L)), (1L, 9L, 20L, Seq.empty[Long]))
    assert(simplify(tree) == tree.toSet)
    // parallel chains: first by (|inter|, inter) kept, others split at the
    // middle interior vertex
    val par = Seq(
      (1L, 0L, 9L, Seq.empty[Long]),
      (1L, 0L, 9L, Seq(3L)),
      (1L, 0L, 9L, Seq(5L, 6L, 7L, 8L)))
    assert(simplify(par) == Set(
      (1L, 0L, 9L, Seq()),
      (1L, 0L, 3L, Seq()), (1L, 3L, 9L, Seq()),
      (1L, 0L, 6L, Seq(5L)), (1L, 6L, 9L, Seq(7L, 8L))))
    // pure-cycle self loop: three arcs at interior thirds
    val cyc = Seq((1L, 10L, 10L, Seq(11L, 12L, 13L, 14L, 15L, 16L)))
    assert(simplify(cyc) == Set(
      (1L, 10L, 13L, Seq(11L, 12L)),
      (1L, 13L, 15L, Seq(14L)),
      (1L, 10L, 15L, Seq(16L))))
    // input self loop (empty inter) passes through
    assert(simplify(Seq((1L, 4L, 4L, Seq.empty[Long]))) ==
      Set((1L, 4L, 4L, Seq.empty[Long])))
    // result is always a simple graph: no duplicate canonical keys
    val mixed = par ++ cyc
    val keys = simplify(mixed).toSeq.map(r => (r._1, r._2, r._3))
    assert(keys.distinct.size == keys.size)
  }

  test("parallelism invariance: identical output at 1 and 7 partitions") {
    val es = (randomTree(0, 120, 9) ++ Seq((3L, 77L), (11L, 95L)))
      .map(e => (1L, e._1, e._2))
    def run(parts: String): Set[(Long, Long, Long, Seq[Long])] = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try contract(es, Seq((1L, 40L)))
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    assert(run("1") == run("7"))
  }
}
