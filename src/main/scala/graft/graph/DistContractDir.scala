package graft.graph

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DIRECTED degree-2 chain contraction — the D16 scale path's analogue of
  * [[DistContract]]. Contracts every maximal run of vertexes with
  * in-degree 1 AND out-degree 1 (within their group) into one macro edge
  * carrying the interior node path, the chain length (summed src→dst, the
  * same op order as the single-task walk), and the attributes of the
  * chain's FINAL constituent edge — `last_flow` / `last_src` — which are
  * exactly what the D16 grouped-waterways line walk
  * (/root/reference/down/main.rs:1964-2004; our port in
  * [[WaterwayFeatures.groupedWaterwayFeatures]]) consults when it picks
  * an in-edge at a junction: interior chain nodes have exactly one
  * in-edge, so the walk makes decisions ONLY at pillar vertexes, and a
  * replay over the contracted multigraph visits constituent edges in the
  * identical order (D16AtScaleSpec pins byte parity against the
  * single-task port).
  *
  * Every step is a deterministic function of the edge set (chain ids are
  * min-packed-nid CC labels; cycles orient from their least node), so the
  * output is bit-identical at any parallelism. Self-loop edges pass
  * through as macro edges; vertexes carrying a self loop are never
  * contracted. Directed pure cycles (every node in/out-degree 1, no
  * pillar attachment) come out as `is_cycle` rows `src == dst == least
  * node` — they are unreachable for the line walk and expand into the
  * reference's per-edge fallback lines.
  *
  * Scale shape: degree census and classification are map-combinable
  * groupBys keyed by (g, nid); chain identification reuses the
  * large/small-star CC operator over chain-chain edges only (node ids
  * packed `g << nidBits | nid` so same-nid chains in DIFFERENT groups
  * never merge); the per-chain walk groups by chain id — task memory is
  * O(longest chain), loudly guarded, not O(component).
  */
object DistContractDir {

  /** @param edges (g, src, dst, len, flow) directed; (g, src, dst)
    *              duplicates collapse first-wins like the local walk's
    *              map intake
    * @param nidBits packing width: requires nid < 2^nidBits and
    *              g < 2^(63-nidBits) (OSM nids fit 40 bits)
    * @return (g, src, dst, inter: array<long> oriented src→dst,
    *         len, last_flow, last_src, n_edges, is_cycle)
    */
  def contract(
      edges: DataFrame, spark: SparkSession,
      what: String = "DistContractDir chain", nidBits: Int = 40): DataFrame = {
    import spark.implicits._

    val e = edges
      .select(col("g").cast("long"), col("src").cast("long"),
        col("dst").cast("long"), col("len").cast("double"),
        col("flow").cast("double"))
      .dropDuplicates("g", "src", "dst")
      .localCheckpoint(true)

    // nodes owning a self loop stay pillars (the walk can revisit them)
    val selfNodes = e.filter(col("src") === col("dst"))
      .select(col("g"), col("src").as("nid")).distinct()
    val inDeg = e.groupBy(col("g"), col("dst").as("nid"))
      .agg(count(lit(1)).as("ind"))
    val outDeg = e.groupBy(col("g"), col("src").as("nid"))
      .agg(count(lit(1)).as("outd"))
    val chainNodes = inDeg.join(outDeg, Seq("g", "nid"))
      .filter(col("ind") === 1 && col("outd") === 1)
      .join(selfNodes, Seq("g", "nid"), "left_anti")
      .select("g", "nid")
      .localCheckpoint(true)

    val scF = chainNodes.select(col("g"), col("nid").as("src"), lit(true).as("sc"))
    val dcF = chainNodes.select(col("g"), col("nid").as("dst"), lit(true).as("dc"))
    val classified = e
      .join(scF, Seq("g", "src"), "left")
      .join(dcF, Seq("g", "dst"), "left")
      .select(col("g"), col("src"), col("dst"), col("len"), col("flow"),
        coalesce(col("sc"), lit(false)).as("sc"),
        coalesce(col("dc"), lit(false)).as("dc"))
      .localCheckpoint(true)

    // pillar-pillar edges pass through one-to-one
    val pp = classified.filter(!col("sc") && !col("dc"))
      .select(col("g"), col("src"), col("dst"),
        array().cast("array<long>").as("inter"), col("len"),
        col("flow").as("last_flow"), col("src").as("last_src"),
        lit(1L).as("n_edges"), lit(false).as("is_cycle"))

    def packed(n: Column): Column = shiftleft(col("g"), nidBits).bitwiseOR(n)

    // chain id = min-packed-nid CC label over chain-chain edges; chain
    // nodes with both neighbours pillar label themselves
    val cc = classified.filter(col("sc") && col("dc"))
      .select(packed(col("src")).as("src"), packed(col("dst")).as("dst"))
    val chainRows = classified.filter(col("sc") || col("dc"))
    val labels =
      if (cc.isEmpty)
        chainNodes.select(packed(col("nid")).as("pnid"),
          packed(col("nid")).as("chain"))
      else {
        val l = ConnectedComponents.run(cc).labels
          .select(col("nid").as("pnid"), col("comp").as("chain"))
        chainNodes.select(col("g"), packed(col("nid")).as("pnid"))
          .join(l, Seq("pnid"), "left")
          .select(col("pnid"), coalesce(col("chain"), col("pnid")).as("chain"))
      }
    val routed = chainRows
      .withColumn("pnid",
        when(col("sc"), packed(col("src"))).otherwise(packed(col("dst"))))
      .join(labels, Seq("pnid"))
      .select("chain", "g", "src", "dst", "len", "flow", "sc", "dc")

    val chains = routed
      .as[(Long, Long, Long, Long, Double, Double, Boolean, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (chain, it) =>
        val rows = Local.boundedSeq(it, s"$what (chain $chain)")
        val g = rows.head._2
        // out-edge per chain node (out-degree exactly 1 by construction)
        val nextE = mutable.HashMap.empty[Long, (Long, Double, Double, Boolean)]
        val entries = mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
        rows.foreach { case (_, _, s, d, l, f, isSc, isDc) =>
          if (isSc) nextE(s) = (d, l, f, isDc)
          else entries += ((s, d, l, f)) // pillar → first chain node
        }
        if (entries.length > 1)
          throw new IllegalStateException(
            s"$what $chain: ${entries.length} entry edges into one " +
              "directed chain — census and classification disagree")
        entries.headOption match {
          case Some((p0, c0, l0, f0)) =>
            // path (or cycle through one pillar): walk src→dst
            val inter = mutable.ArrayBuffer(c0)
            var lenSum = l0
            var cur = c0
            var res: Option[(Long, Long, Long, Seq[Long], Double, Double, Long, Long, Boolean)] =
              None
            while (res.isEmpty) {
              val (d, l, f, dIsChain) = nextE.getOrElse(cur,
                throw new IllegalStateException(
                  s"$what $chain: chain node $cur has no out-edge"))
              lenSum += l
              if (dIsChain) { inter += d; cur = d }
              else res = Some((g, p0, d, inter.toSeq, lenSum,
                f, cur, inter.length + 1L, false))
            }
            res.iterator
          case None =>
            // directed pure cycle: orient from the least node
            val m = nextE.keys.min
            val inter = mutable.ArrayBuffer.empty[Long]
            val (d0, l0, f0, _) = nextE(m)
            var cur = d0
            var lenSum = l0
            var lastF = f0
            var lastS = m
            while (cur != m) {
              inter += cur
              val (d, l, f, _) = nextE(cur)
              lenSum += l
              lastF = f
              lastS = cur
              cur = d
            }
            Iterator.single((g, m, m, inter.toSeq, lenSum, lastF, lastS,
              inter.length + 1L, true))
        }
      }
      .toDF("g", "src", "dst", "inter", "len", "last_flow", "last_src",
        "n_edges", "is_cycle")

    pp.unionByName(chains)
  }
}
