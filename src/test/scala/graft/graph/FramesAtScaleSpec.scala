package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.pipeline.Extras

/** Pins the frames scale path (DistHull + DistContract +
  * framesCompressed) against the exact single-task port on fixtures
  * whose shortest paths are unique, plus DistHull against
  * Local.convexHull directly.
  */
class FramesAtScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Two components: a chain-heavy random tree and a cyclic graph, with
    * seeded distinct positions (unique shortest paths, verified by the
    * parity assertions themselves).
    */
  private def fixture(seed: Long): (Seq[(Long, Long)], Map[Long, (Double, Double)]) = {
    val rng = new scala.util.Random(seed)
    val tree = (1 until 50).map { i =>
      val p = if (i == 1) 0 else rng.nextInt(math.max(1, i / 2))
      (p.toLong, i.toLong)
    }
    val cyc0 = (101 until 130).map(i => (i.toLong - 1L, i.toLong))
    val cyc = cyc0 ++ Seq((129L, 100L), (105L, 118L), (110L, 124L))
    val edges = tree ++ cyc
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val pos = verts.map(v =>
      v -> (rng.nextDouble() * 10 - 5, rng.nextDouble() * 10 - 5)).toMap
    (edges, pos)
  }

  private def run(seed: Long, threshold: Long): Set[(Long, Int, Seq[Long])] = {
    val (edges, pos) = fixture(seed)
    val eDf = edges.toDF("src", "dst")
    val nDf = pos.toSeq.map { case (n, (la, lo)) => (n, la, lo) }
      .toDF("nid", "lat", "lon")
    Extras.frames(eDf, nDf, spark, threshold)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toSeq))
      .toSet
  }

  test("scale path ≡ exact local port on unique-shortest-path fixtures") {
    for (seed <- Seq(3L, 11L)) {
      val local = run(seed, Long.MaxValue) // every component local
      val scale = run(seed, 1L)            // every component scale path
      assert(local.nonEmpty && local == scale, s"seed $seed")
    }
  }

  test("hybrid gate routes per component, union is consistent") {
    // threshold between the two components' edge counts: the tree (49
    // edges) goes local, the cycle component (32 edges) goes local too
    // at 40+; at 40 the tree goes scale
    val mixed = run(3L, 40L)
    assert(mixed == run(3L, Long.MaxValue))
  }

  test("scale path is parallelism-invariant") {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val a = try {
      spark.conf.set("spark.sql.shuffle.partitions", "1"); run(7L, 1L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "9"); run(7L, 1L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    assert(a == b && a.nonEmpty)
  }

  test("DistHull ≡ Local.convexHull + min-nid pick, any bucketing") {
    val rng = new scala.util.Random(13)
    val verts = (0L until 400L).map(v =>
      (1L, v, rng.nextDouble() * 90, rng.nextDouble() * 180))
    val df = verts.toDF("comp", "nid", "lat", "lon")
    val wantPts = Local.convexHull(verts.map(v => (v._3, v._4)))
    val byPoint = verts.groupBy(v => (v._3, v._4))
    val want = wantPts.map(p => byPoint(p).map(_._2).min).toSet
    for (buckets <- Seq(1, 16, 256)) {
      val got = DistHull.hullNids(df, spark, buckets)
        .collect().map(_.getLong(1)).toSet
      assert(got == want, s"buckets $buckets")
    }
  }
}
