package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** P8 engine shape: betweenness emits one feature per COMPRESSED edge
  * with pair counts over compressed vertexes — the reference compresses
  * every way group (main.rs:611-632) before do_betweenness samples it.
  */
class ExtrasBetweennessSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val nodes = Seq(
    (1L, 0.0, 0.000), (2L, 0.0, 0.001), (3L, 0.0, 0.002), (4L, 0.0, 0.003),
    (21L, 0.001, 0.002))
    .toDF("nid", "lat", "lon")

  test("chain compresses to ONE edge; value counts compressed pairs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val rows = Extras.betweenness(edges, nodes, spark).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getAs[Long]("src"), r.getAs[Long]("dst")) == ((1L, 4L)))
    assert(r.getAs[collection.Seq[Long]]("chain") == Seq(1L, 2L, 3L, 4L))
    // compressed vertexes {1, 4}: ONE unordered pair, counted once
    // (reference counts targets after the source only,
    // undirected_graph.rs:584) → value 1; fraction denominators over
    // n·(n−1)/2 = 1, so value_fraction_max ≤ 1 like the reference
    assert(r.getAs[Double]("value") == 1.0)
    assert(r.getAs[Double]("comp_max_value") == 1.0)
    assert(r.getAs[Double]("value_fraction") == 1.0)
    assert(r.getAs[Double]("value_fraction_max") == 1.0)
  }

  test("Y graph: three compressed edges, equal leaf values") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 21L)).toDF("src", "dst")
    val rows = Extras.betweenness(edges, nodes, spark)
      .collect()
      .map(r => ((r.getAs[Long]("src"), r.getAs[Long]("dst")),
        r.getAs[Double]("value"))).toMap
    // pillars {1, 3, 4, 21}; each leaf edge separates 1 vs 3 vertexes:
    // value = 1·3 = 3 (each unordered pair once)
    assert(rows.keySet == Set((1L, 3L), (3L, 4L), (3L, 21L)))
    assert(rows.values.toSet == Set(3.0))
  }

  test("zero-centrality edges are seeded and emitted (reference bc_res init)") {
    // cycle 2-1-3-21-2 where nid 1 (compressed away first — min nid) is
    // a far detour: compressed edge (2,3) carries the long chain through
    // 1 and lies on NO shortest path, but the reference initialises
    // bc_res to 0 for every compressed edge, so it must appear with
    // value 0 (and pass the default min-value 0 filter)
    val cycNodes = Seq(
      (1L, 0.01, 0.0005), (2L, 0.0, 0.000), (3L, 0.0, 0.001),
      (21L, 0.0, 0.0005)).toDF("nid", "lat", "lon")
    val edges = Seq((2L, 1L), (1L, 3L), (3L, 21L), (21L, 2L)).toDF("src", "dst")
    val rows = Extras.betweenness(edges, cycNodes, spark)
      .collect()
      .map(r => ((r.getAs[Long]("src"), r.getAs[Long]("dst")),
        r.getAs[Double]("value"))).toMap
    assert(rows.keySet == Set((2L, 3L), (2L, 21L), (3L, 21L)))
    assert(rows((2L, 3L)) == 0.0)
    assert(rows((2L, 21L)) == 2.0 && rows((3L, 21L)) == 2.0)
  }
}
