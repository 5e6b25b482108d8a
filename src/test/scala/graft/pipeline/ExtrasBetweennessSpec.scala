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
    // compressed vertexes {1, 4}: one unordered pair, counted from both
    // sources → value 2; fraction denominators over n = 2
    assert(r.getAs[Double]("value") == 2.0)
    assert(r.getAs[Double]("comp_max_value") == 2.0)
    assert(r.getAs[Double]("value_fraction") == 1.0)
    assert(r.getAs[Double]("value_fraction_max") == 2.0) // 2 / (2·1/2)
  }

  test("Y graph: three compressed edges, equal leaf values") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 21L)).toDF("src", "dst")
    val rows = Extras.betweenness(edges, nodes, spark)
      .collect()
      .map(r => ((r.getAs[Long]("src"), r.getAs[Long]("dst")),
        r.getAs[Double]("value"))).toMap
    // pillars {1, 3, 4, 21}; each leaf edge separates 1 vs 3 vertexes:
    // value = 2·1·3 = 6
    assert(rows.keySet == Set((1L, 3L), (3L, 4L), (3L, 21L)))
    assert(rows.values.toSet == Set(6.0))
  }
}
