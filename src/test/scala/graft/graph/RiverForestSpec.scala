package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.fixtures.Synthetic

/** Pins the invariants of the controlled-group-count river-tree forest
  * that backs the D16 at-scale evidence run (tools.D16AtScale): exact
  * group count, real confluences, DAG orientation, full coverage.
  */
class RiverForestSpec extends AnyFunSuite with SparkTestBase {

  test("river forest: one tag group per chain, exactly") {
    // 16 chains of 50 edges = 2 clusters of 8
    val e = Synthetic.riverForest(spark, 800L, 16L).cache()
    assert(e.count() == 800L)
    val groups = DownOps.tagGroupCC(e.select("src", "dst", "tag"))
      .select("tag", "tag_group_nid").distinct().count()
    assert(groups == 16L)
    e.unpersist()
  }

  test("river forest: 7 confluences per cluster, on interior trunk nodes") {
    val e = Synthetic.riverForest(spark, 800L, 16L).cache()
    // a confluence = node with >1 in-edge; tributaries join only trunks
    val confl = e.groupBy("dst").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(confl.count() == 14L) // 7 tributaries × 2 clusters
    // every confluence node belongs to a trunk chain (chain % 8 == 0):
    // node(chain, p) = chain*(L+2)+p with L=50 → chain = nid / 52
    val badOwner = confl.filter((col("dst") / lit(52L)).cast("long") % 8 =!= 0)
    assert(badOwner.count() == 0L)
    e.unpersist()
  }

  test("river forest: pos-ascending DAG — upstream flow completes with conservation") {
    val e = Synthetic.riverForest(spark, 800L, 16L)
    val up = graft.graph.Flow.upstreamFlowHybrid(
      e.select("src", "dst", "len").withColumn("tag", lit(null).cast("string")))
    // acyclic + full split rule → every edge gets a flow, and each
    // chain-terminal edge's flow is bounded by the total upstream length
    val flows = up.edgeFlow
    assert(flows.count() == 800L)
    val total = e.agg(sum("len")).head().getDouble(0)
    val maxFlow = flows.agg(max("flow_m")).head().getDouble(0)
    assert(maxFlow <= total + 1e-6)
  }
}
