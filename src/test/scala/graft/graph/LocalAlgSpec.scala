package graft.graph

import org.scalatest.funsuite.AnyFunSuite

/** Pure local algorithms (SURVEY.md §2.5): line peeling, Dijkstra,
  * convex hull, degree-2 compression.
  */
class LocalAlgSpec extends AnyFunSuite {

  test("peelLines: Y graph peels deterministically in sorted-neighbour order") {
    val lines = Local.peelLines(Seq((1L, 2L), (2L, 3L), (2L, 4L)))
    assert(lines == Seq(Seq(1L, 2L, 3L), Seq(2L, 4L)))
  }

  test("peelLines: cycle peels into one closed walk") {
    val lines = Local.peelLines(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(lines == Seq(Seq(1L, 2L, 3L, 1L)))
  }

  test("peelLines consumes every edge exactly once") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (5L, 6L), (6L, 2L))
    val lines = Local.peelLines(es)
    val covered = lines.flatMap(l => l.sliding(2).map(p =>
      (math.min(p(0), p(1)), math.max(p(0), p(1)))))
    assert(covered.sorted == es.map(p =>
      (math.min(p._1, p._2), math.max(p._1, p._2))).sorted)
  }

  test("dijkstra: shortest paths and parents") {
    val adj = Map(
      1L -> Seq((2L, 1.0), (3L, 4.0)),
      2L -> Seq((1L, 1.0), (3L, 1.0)),
      3L -> Seq((1L, 4.0), (2L, 1.0)))
    val (dist, parent) = Local.dijkstra(adj, 1L)
    assert(dist == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
    assert(Local.pathTo(parent, 1L, 3L).contains(Seq(1L, 2L, 3L)))
    assert(Local.pathTo(parent, 1L, 99L).isEmpty)
  }

  test("convexHull: square with interior point") {
    val hull = Local.convexHull(Seq(
      (0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (1.0, 1.0)))
    assert(hull.toSet == Set((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
  }

  test("convexHull: collinear points collapse to segment ends") {
    val hull = Local.convexHull(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0)))
    assert(hull.toSet == Set((0.0, 0.0), (2.0, 2.0)))
  }

  test("compress: degree-2 chain merges with concatenated intermediates") {
    val out = Local.compress(
      Seq((1L, 2L, Seq(9L)), (2L, 3L, Nil), (3L, 4L, Seq(8L))),
      _ => false)
    assert(out == Seq((1L, 4L, Seq(9L, 2L, 3L, 8L))))
  }

  test("compress: neverRemove pins a vertex") {
    val out = Local.compress(
      Seq((1L, 2L, Nil), (2L, 3L, Nil), (3L, 4L, Nil)),
      _ == 3L).toSet
    assert(out == Set((1L, 3L, Seq(2L)), (3L, 4L, Seq())))
  }

  test("compress: skips merge that would duplicate an existing edge") {
    // triangle with a chain: merging 2 away would duplicate (1,3)
    val out = Local.compress(
      Seq((1L, 2L, Nil), (2L, 3L, Nil), (1L, 3L, Nil)),
      _ => false).toSet
    assert(out == Set((1L, 2L, Seq()), (2L, 3L, Seq()), (1L, 3L, Seq())))
  }
}
