package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl prioritization / quality weighting —
  * the web-pipeline op that ranks pages (or hosts) by incoming links
  * before sampling training data (Common-Crawl-style harmonic/PageRank
  * ranks).
  *
  * Everything is integer-exact so DuckDB replays it bit-for-bit: ranks
  * are parts-per-billion BIGINTs, every division is floor integer
  * division (`div`), and all cross-engine sums are integer sums
  * (order-free). Damping 0.85 becomes `(85 * s) div 100`; the teleport
  * term is `150000000 div n` ppb.
  *
  * Scale shape: one groupBy for out-degrees, then per iteration one
  * src-keyed equi-join (rank onto edges) and one dst-keyed partial-agg
  * groupBy — the canonical distributed PageRank round. On a real
  * cluster the edge table is bucketed by `src` once so the per-round
  * join is co-partitioned; the rank frame is the only thing that moves
  * (O(V) per round, not O(E)).
  */
object LinkGraph {

  /** Deterministic synthetic link set: page `d` links to
    * `(31·d + 17·i + 7) mod n` for i ∈ {0,1,2}, self-links dropped
    * (so out-degree ∈ {2,3} — the per-node degree path stays real).
    */
  def syntheticEdges(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("doc_id").as("src"),
        explode(array((0 to 2).map(i =>
          (col("doc_id") * 31 + lit(17L * i + 7)) % n): _*)).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  /** `iters` exact-integer PageRank rounds; returns (doc_id, rank_ppb). */
  def pagerank(
      nodes: DataFrame, edges: DataFrame, n: Long, iters: Int = 5): DataFrame = {
    val tele = 150000000L / n
    val init = 1000000000L / n
    val e = edges.join(
      edges.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
    var r = nodes.select(col("doc_id"), lit(init).as("r"))
    for (_ <- 1 to iters) {
      val c = e.join(r.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      r = nodes.join(c.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(tele) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
    }
    r.select(col("doc_id"), col("r").as("rank_ppb"))
  }
}
