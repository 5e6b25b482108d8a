package graft.graph

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed degree-2 chain contraction — the scale path for the
  * per-component operators whose local stage otherwise materializes a
  * whole component in one task (SURVEY §7.5.4; the round-3 percolated-run
  * cliff). Contracts every maximal run of degree-2 vertexes not in the
  * `keep` set into one edge carrying the interior node path, so a
  * downstream `flatMapGroups` holds O(pillar graph) instead of
  * O(component) — on chain-dominated river topology a 10-30× task-memory
  * reduction with identical graph metric structure.
  *
  * SEMANTICS vs [[Local.compress]] (the reference's merge-order form,
  * undirected_graph.rs:640-716): `Local.compress` skips a merge that
  * would duplicate an existing edge or close a self loop, leaving
  * merge-order-dependent partial chains on diamonds/cycles; this
  * operator is the METRIC-PRESERVING variant — it always contracts the
  * full run and emits a multigraph row per chain (parallel chains
  * between one pillar pair stay two rows; a cycle through one pillar
  * becomes a self-loop row). Shortest-path structure is identical; only
  * consumers that need the reference's exact contracted-edge SET (P8
  * betweenness σ counts) must keep the local form. On trees and chain
  * forests — no duplicate/self-loop skips possible — the two forms emit
  * the exact same canonical edge set (DistContractSpec pins it).
  *
  * Every step is a deterministic function of the canonicalized edge set
  * (CC labels are min-nid; walks orient from the least endpoint), so the
  * output is bit-identical at any parallelism (spec-pinned).
  *
  * Shapes at scale: degree census + classification are map-combinable
  * groupBys keyed by nid; chain identification reuses the large/small-star
  * CC operator over chain-chain edges only (frontier-bounded rounds);
  * the per-chain walk groups by chainId — task memory is O(longest
  * chain), loudly guarded, not O(component).
  */
object DistContract {

  /** @param edges (comp, src, dst) undirected; duplicates and self loops
    *              tolerated (canonical-deduped exactly like
    *              Local.compress's first-wins intake)
    * @param keep  (comp, nid) vertexes that must survive contraction
    *              (hull points, betweenness samples, user pins)
    * @return (comp, src, dst, inter: array<long>) — src<=dst, inter
    *         oriented src→dst; self-loop rows have src==dst with inter
    *         oriented from the least adjacent interior node; input self
    *         loops pass through with empty inter
    */
  def contract(
      edges: DataFrame, keep: DataFrame, spark: SparkSession,
      what: String = "DistContract chain"): DataFrame = {
    import spark.implicits._

    val canon = edges
      .select(col("comp").cast("long"),
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
      .localCheckpoint(true)
    val selfLoops = canon.filter(col("a") === col("b"))
    val e = canon.filter(col("a") =!= col("b"))

    // degree census mirrors Local.compress: distinct canon edges count 1
    // per endpoint, self loops count 2
    val deg = e.select(col("comp"), col("a").as("nid"))
      .unionAll(e.select(col("comp"), col("b").as("nid")))
      .unionAll(selfLoops.select(col("comp"), col("a").as("nid")))
      .unionAll(selfLoops.select(col("comp"), col("a").as("nid")))
      .groupBy("comp", "nid").agg(count(lit(1)).as("deg"))

    val chainNodes = deg.filter(col("deg") === 2)
      .join(keep.select(col("comp"), col("nid")), Seq("comp", "nid"),
        "left_anti")
      .select("comp", "nid")
      .localCheckpoint(true)

    val aChain = chainNodes.select(col("comp"), col("nid").as("a"),
      lit(true).as("a_chain"))
    val bChain = chainNodes.select(col("comp"), col("nid").as("b"),
      lit(true).as("b_chain"))
    val classified = e
      .join(aChain, Seq("comp", "a"), "left")
      .join(bChain, Seq("comp", "b"), "left")
      .select(col("comp"), col("a"), col("b"),
        coalesce(col("a_chain"), lit(false)).as("ac"),
        coalesce(col("b_chain"), lit(false)).as("bc"))
      .localCheckpoint(true)

    val pp = classified.filter(!col("ac") && !col("bc"))
      .select(col("comp"), col("a").as("src"), col("b").as("dst"),
        array().cast("array<long>").as("inter"))

    // chainId = min-nid CC label over chain-chain edges; singleton chain
    // nodes (both neighbours pillars) label themselves
    val cc = classified.filter(col("ac") && col("bc"))
      .select(col("a").as("src"), col("b").as("dst"))
    val chainEdgeRows = classified.filter(col("ac") || col("bc"))
    val labels =
      if (cc.isEmpty) chainNodes.select(col("nid"), col("nid").as("chain"))
      else ConnectedComponents.run(cc).labels
        .select(col("nid"), col("comp").as("chain"))
    val chainId = chainNodes.select(col("comp"), col("nid"))
      .join(labels, Seq("nid"), "left")
      .select(col("comp"), col("nid"),
        coalesce(col("chain"), col("nid")).as("chain"))

    // route every chain-incident edge to its chain's group; an inner
    // (chain-chain) edge goes to ONE group — both endpoints share it
    val routed = chainEdgeRows
      .select(col("comp"), col("a"), col("b"), col("ac"), col("bc"),
        when(col("ac"), col("a")).otherwise(col("b")).as("nid"))
      .join(chainId.select(col("nid"), col("chain")), Seq("nid"))
      .select("comp", "chain", "a", "b", "ac", "bc")

    val chains = routed
      .as[(Long, Long, Long, Long, Boolean, Boolean)]
      .groupByKey(_._2)
      .flatMapGroups { (chain, rows0) =>
        val rows = Local.boundedSeq(rows0, s"$what (chain $chain)")
        val comp = rows.head._1
        // adjacency over this chain's nodes; attachments = (pillar, node)
        val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
        val attach = mutable.ArrayBuffer.empty[(Long, Long)]
        rows.foreach { case (_, _, a, b, ac, bc) =>
          if (ac && bc) {
            adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
            adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
          } else if (ac) attach += ((b, a))
          else attach += ((a, b))
        }
        // walk from `first` (with `from` behind us) until a dead end or
        // until stepping onto `stopAt` (cycle closure, excluded)
        def walk(from: Long, first: Long, stopAt: Long): Seq[Long] = {
          val out = mutable.ArrayBuffer(first)
          var prev = from
          var cur = first
          var next = adj.getOrElse(cur, mutable.ArrayBuffer.empty[Long])
            .filter(n => n != prev && n != stopAt)
          while (next.nonEmpty) {
            prev = cur
            cur = next.head
            out += cur
            next = adj(cur).filter(n => n != prev && n != stopAt)
          }
          out.toSeq
        }
        attach.sortBy(identity).toList match {
          case (p1, c1) :: (p2, _) :: Nil =>
            // path chain pillar→…→pillar: orient from the least
            // (pillar, entry) attachment — p1 <= p2 after the sort, so
            // the row is already canonical (src<=dst, inter src→dst)
            Iterator.single((comp, p1, p2, walk(p1, c1, Long.MinValue)))
          case Nil =>
            // pure cycle of chain nodes: break at the least node, walk
            // towards its least neighbour, stop before closing the loop
            val m = adj.keys.min
            Iterator.single((comp, m, m, walk(m, adj(m).min, m)))
          case other =>
            throw new IllegalStateException(
              s"$what $chain: ${other.length} pillar attachments on a " +
                "degree-2 chain — impossible unless the degree census " +
                "and edge classification disagree")
        }
      }
      .toDF("comp", "src", "dst", "inter")

    pp.unionByName(
        selfLoops.select(col("comp"), col("a").as("src"), col("a").as("dst"),
          array().cast("array<long>").as("inter")))
      .unionByName(chains)
  }
}
