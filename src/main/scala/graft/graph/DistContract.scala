package graft.graph

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *              Local.compress's first-wins intake); nids must fit
    *              40 bits (the packed chain-CC key — loudly checked),
    *              the same contract LumpWays documents for OSM ids
    * @param keep  (comp, nid) vertexes that must survive contraction
    *              (hull points, betweenness samples, user pins)
    * @return (comp, src, dst, inter: array<long>) — src<=dst, inter
    *         oriented src→dst; self-loop rows have src==dst with inter
    *         oriented from the least adjacent interior node; input self
    *         loops pass through with empty inter
    */
  def contract(
      edges: DataFrame, keep: DataFrame, spark: SparkSession,
      what: String = "DistContract chain",
      assumeCanonical: Boolean = false,
      keepKnownEmpty: Boolean = false,
      compsOpt: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._

    // assumeCanonical: the caller already holds this edge set canonical
    // (src<=dst), distinct and materialized (betweennessGrouped derives
    // exactly that frame for its size gate) — skip the redundant
    // full-shuffle distinct + checkpoint (guide §2.4). keepKnownEmpty
    // skips the keep anti-join when the caller statically passes no
    // pillars to pin. compsOpt: a caller-held distinct comp frame (the
    // size gate's output) replaces the comp-distinct shuffle feeding
    // tinyDenseId.
    val canon =
      if (assumeCanonical)
        edges.select(col("comp").cast("long"), col("src").cast("long").as("a"),
          col("dst").cast("long").as("b"))
      else edges
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

    val deg2 = deg.filter(col("deg") === 2)
    val chainNodes = (if (keepKnownEmpty) deg2
      else deg2.join(keep.select(col("comp"), col("nid")), Seq("comp", "nid"),
        "left_anti"))
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

    // chainId = min-composite-key CC label over chain-chain edges;
    // singleton chain nodes (both neighbours pillars) label themselves.
    // The CC and the routing join must be COMP-AWARE: betweennessGrouped
    // contracts per WAY GROUP, and one nid can be a chain node in several
    // groups (the LumpWays C1 situation) — a nid-only key would merge
    // chains across groups. Same packed-composite contract as LumpWays:
    // dense group index << 40 | nid, loud on nids above 2^40.
    val compIdx = graft.runtime.Ranks.tinyDenseId(
      compsOpt.map(_.select("comp")).getOrElse(canon.select("comp").distinct()),
      Seq(col("comp")), "gidx")
    // gidx guarded like nid: >2^23 distinct comps would shift into the
    // sign bit and corrupt the chain-CC min labels — fail loudly instead
    def packed(nid: Column) = shiftleft(
      when(col("gidx").between(0, (1L << 23) - 1), col("gidx"))
        .otherwise(raise_error(concat(
          lit("DistContract: more than 2^23 distinct comps — the packed "),
          lit("composite key would overflow; gidx="),
          col("gidx").cast("string")))), 40).bitwiseOR(
      when(nid.between(0, (1L << 40) - 1), nid).otherwise(raise_error(concat(
        lit("DistContract: nid outside the 40-bit composite range: "),
        nid.cast("string")))))
    val cc = classified.filter(col("ac") && col("bc"))
      .join(compIdx, Seq("comp"))
      .select(packed(col("a")).as("src"), packed(col("b")).as("dst"))
    val chainEdgeRows = classified.filter(col("ac") || col("bc"))
    val chainNodesP = chainNodes.join(compIdx, Seq("comp"))
      .select(col("comp"), col("nid"), packed(col("nid")).as("cnid"))
    val labels =
      if (cc.isEmpty) chainNodesP.select(col("cnid"), col("cnid").as("chain"))
      // cc derives from the canonical-deduped `classified` frame — the
      // packed pairs are already distinct
      else ConnectedComponents.run(cc, assumeDistinct = true).labels
        .select(col("nid").as("cnid"), col("comp").as("chain"))
    val chainId = chainNodesP
      .join(labels, Seq("cnid"), "left")
      .select(col("comp"), col("nid"),
        coalesce(col("chain"), col("cnid")).as("chain"))

    // route every chain-incident edge to its chain's group; an inner
    // (chain-chain) edge goes to ONE group — both endpoints share it
    val routed = chainEdgeRows
      .select(col("comp"), col("a"), col("b"), col("ac"), col("bc"),
        when(col("ac"), col("a")).otherwise(col("b")).as("nid"))
      .join(chainId, Seq("comp", "nid"))
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

  /** Turn [[contract]]'s metric-preserving MULTIGRAPH into a SIMPLE
    * graph by re-expanding interior vertexes of the conflicting chains —
    * the P8 betweenness scale path's step-1 shape (Extras scaladoc).
    *
    * Per canonical (comp, src, dst) row group, ordered by
    * (|inter|, inter): the first row keeps its full contraction; every
    * further parallel chain splits at its MIDDLE interior vertex into two
    * edges, and a cycle row (src==dst from a pure chain cycle) splits at
    * two interior vertexes into three arcs. This is exactly the shape a
    * [[Local.compress]] merge order produces when a merge would duplicate
    * an edge or close a self loop (undirected_graph.rs:677-699 skips
    * those merges, leaving one un-merged vertex per conflicting chain; a
    * pure cycle bottoms out as a triangle) — i.e. one REALIZABLE merge
    * order of the reference's order-dependent contraction, fixed
    * deterministically at the chain midpoint. On trees and chain forests
    * there are no conflicts and this is the identity. Input self loops
    * (empty inter) pass through; interior vertexes belong to exactly one
    * chain, so splits can never introduce a new conflict.
    */
  def simplify(contracted: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    def canon(a: Long, b: Long, inter: Seq[Long]): (Long, Long, Seq[Long]) =
      if (a <= b) (a, b, inter) else (b, a, inter.reverse)
    contracted
      .select(col("comp").cast("long"), col("src").cast("long"),
        col("dst").cast("long"), col("inter").cast("array<long>"))
      .as[(Long, Long, Long, Seq[Long])]
      .groupByKey(r => (r._1, r._2, r._3))
      .flatMapGroups { (key: (Long, Long, Long), rows0: Iterator[(Long, Long, Long, Seq[Long])]) =>
        val (comp, src, dst) = key
        // loud guard: a braided pair with MANY huge parallel chains would
        // otherwise OOM this task silently (repo task-memory contract)
        val rows = Local.boundedSeq(rows0.map(_._4),
            s"DistContract.simplify (pair $comp:$src-$dst)")
          .sortBy(iv => (iv.length, iv))(
          Ordering.Tuple2(Ordering.Int, Ordering.Implicits.seqOrdering[Seq, Long]))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Seq[Long])]
        if (src != dst) {
          out += ((comp, src, dst, rows.head))
          rows.tail.foreach { inter =>
            // a parallel chain always has interiors (exact duplicates were
            // canonical-deduped in contract; only one row per pair can be
            // the direct pillar-pillar edge, and it sorted first)
            val m = (inter.length - 1) / 2
            val (a1, b1, i1) = canon(src, inter(m), inter.slice(0, m))
            val (a2, b2, i2) = canon(inter(m), dst, inter.slice(m + 1, inter.length))
            out += ((comp, a1, b1, i1))
            out += ((comp, a2, b2, i2))
          }
        } else rows.foreach { inter =>
          if (inter.isEmpty) out += ((comp, src, dst, inter)) // input self loop
          else {
            // pure chain cycle: |inter| >= 2 (a 2-cycle would have been a
            // parallel pair deduped in contract) → three arcs
            val k = inter.length
            val j1 = k / 3
            val j2 = math.max(j1 + 1, (2 * k) / 3)
            val (a1, b1, i1) = canon(src, inter(j1), inter.slice(0, j1))
            val (a2, b2, i2) = canon(inter(j1), inter(j2), inter.slice(j1 + 1, j2))
            val (a3, b3, i3) = canon(inter(j2), dst, inter.slice(j2 + 1, k))
            out += ((comp, a1, b1, i1))
            out += ((comp, a2, b2, i2))
            out += ((comp, a3, b3, i3))
          }
        }
        out.iterator
      }
      .toDF("comp", "src", "dst", "inter")
  }
}
