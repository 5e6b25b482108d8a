package graft.graph

import graft.model.Edge
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A contracted edge tagged with its tag-group id (SURVEY C1: each group
  * tuple is an independent graph).
  */
final case class KeyedEdge(gid: Long, src: Long, dst: Long, inter: Seq[Long], wid: Long)

/** Way → contracted edge extraction (SURVEY.md §2.1 S1 + §2.3 G1/G2).
  *
  * Reference: degree census at
  * /root/reference/src/bin/osm-lump-ways/main.rs:256-299, segmentation at
  * main.rs:352-378 (+ consecutive-duplicate dedup in the directed variant,
  * /root/reference/src/bin/osm-lump-ways-down/main.rs:385-393).
  *
  * Scale shape: one explode + one shuffle-join on nid + one regroup by wid.
  * The pillar set (degree ≠ 2 nodes, ~5 % of all nodes) is never collected;
  * it flows through the join. Contraction happens *before* the CC shuffle —
  * the single most important data reduction of the whole pipeline.
  */
object GraphBuild {

  /** S1 — per-node "vertex degree", saturating at 255 (reference uses a
    * saturating u8). The reference's exact (asymmetric!) formula
    * (main.rs:275-280, down/main.rs:1293-1301): first node +1, last node
    * +1, and *every position except 0* (including the last) +2 — so a
    * way's last node always weighs 3 and is always a pillar.
    * Input: ways(wid, nids). Output: (nid, degree).
    */
  def degreeCensus(ways: DataFrame): DataFrame = {
    ways
      .select(posexplode(col("nids")).as(Seq("pos", "nid")),
        size(col("nids")).as("n"))
      .select(col("nid"),
        (when(col("pos") === 0, 1).otherwise(2) +
          when(col("pos") === col("n") - 1, 1).otherwise(0)).as("w"))
      .groupBy("nid")
      .agg(least(sum(col("w")), lit(255L)).as("degree"))
  }

  /** Pure segmentation of one way's node list given the pillar predicate:
    * cut at pillar nodes and way ends, contracting interior nodes into
    * `inter`. Consecutive duplicate nodes are dropped first
    * (down/main.rs:385-393); self-loop segments are skipped.
    */
  def segmentNids(wid: Long, nids: IndexedSeq[Long], isPillar: Long => Boolean): Seq[Edge] = {
    val dedup = new scala.collection.mutable.ArrayBuffer[Long](nids.length)
    nids.foreach { n => if (dedup.isEmpty || dedup.last != n) dedup += n }
    if (dedup.length < 2) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Edge]
    var start = 0
    var i = 1
    while (i < dedup.length) {
      if (i == dedup.length - 1 || isPillar(dedup(i))) {
        val src = dedup(start)
        val dst = dedup(i)
        if (src != dst) {
          out += Edge(src, dst, dedup.slice(start + 1, i).toSeq, wid)
        }
        start = i
      }
      i += 1
    }
    out.toSeq
  }

  /** G1 — contracted edge extraction over a ways DataFrame.
    *
    * Plan: explode(nids) → join degree census on nid (sort-merge; the
    * census is ~#nodes rows, not broadcastable at planet scale) → regroup
    * by wid in nid order → segment. Returns one row per contracted
    * segment with the interior chain inline (replaces InterStore,
    * /root/reference/src/inter_store.rs).
    */
  def contractedEdges(ways: DataFrame, spark: SparkSession): Dataset[Edge] = {
    import spark.implicits._
    contractedEdgesKeyed(ways.withColumn("gid", lit(0L)), spark)
      .map(e => Edge(e.src, e.dst, e.inter, e.wid))
  }

  /** G1 with group keys: ways carry a `gid` column; the census (pillar
    * set) is global (reference pass 1 runs before grouping) but each
    * emitted edge keeps its way's group.
    */
  def contractedEdgesKeyed(ways: DataFrame, spark: SparkSession): Dataset[KeyedEdge] = {
    import spark.implicits._
    val census = degreeCensus(ways)
    val exploded = ways.select(col("wid"), col("gid"),
      posexplode(col("nids")).as(Seq("pos", "nid")))
    exploded
      .join(census.withColumnRenamed("nid", "cnid"),
        exploded("nid") === col("cnid"), "left")
      .select(col("wid"), col("gid"), col("pos"), col("nid"),
        (coalesce(col("degree"), lit(0L)) =!= 2L).as("pillar"))
      .groupBy("wid", "gid")
      .agg(sort_array(collect_list(struct(col("pos"), col("nid"), col("pillar"))))
        .as("pts"))
      .as[(Long, Long, Seq[(Int, Long, Boolean)])]
      .flatMap { case (wid, gid, pts) =>
        val nids = pts.map(_._2).toIndexedSeq
        val pillarSet = pts.filter(_._3).map(_._2).toSet
        segmentNids(wid, nids, pillarSet.contains)
          .map(e => KeyedEdge(gid, e.src, e.dst, e.inter, e.wid))
      }
  }

  /** G2 — canonical undirected edge set: `src < dst`, duplicates resolved
    * deterministically. The reference backs the segment boundary off one
    * node when a contracted edge already exists (parallel riverbanks,
    * main.rs:360-376) — globally order-dependent. Our deterministic
    * equivalent: per canonical (src,dst) group ordered by wid, the first
    * edge keeps the contraction; every later duplicate with interior
    * nodes is split at its last interior node — exactly what the
    * reference's single back-off produces — and empty duplicates are
    * dropped (the reference's `add_edge` no-op). One extra round resolves
    * splits that collide again; deeper pathological collisions (several
    * identical banks) fall back to fully expanding the duplicate.
    */
  def canonicalUndirected(edges: Dataset[Edge]): Dataset[Edge] = {
    val spark = edges.sparkSession
    import spark.implicits._
    canonicalUndirectedKeyed(
      edges.map(e => KeyedEdge(0L, e.src, e.dst, e.inter, e.wid)))
      .map(e => Edge(e.src, e.dst, e.inter, e.wid))
  }

  /** Keyed variant: deduplication is per group graph. */
  def canonicalUndirectedKeyed(edges: Dataset[KeyedEdge]): Dataset[KeyedEdge] = {
    val spark = edges.sparkSession
    import spark.implicits._

    def canon(e: KeyedEdge): KeyedEdge =
      if (e.src <= e.dst) e else KeyedEdge(e.gid, e.dst, e.src, e.inter.reverse, e.wid)

    def dedupRound(es: Dataset[KeyedEdge]): (Dataset[KeyedEdge], Dataset[KeyedEdge]) = {
      val withRn = es.map(canon)
        .toDF()
        .withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("gid", "src", "dst").orderBy("wid", "inter")))
      val keep = withRn.filter(col("rn") === 1).drop("rn").as[KeyedEdge]
      val dups = withRn.filter(col("rn") > 1).drop("rn").as[KeyedEdge]
      (keep, dups)
    }

    val (keep1, dups1) = dedupRound(edges)
    // split duplicates at their last interior node (reference back-off)
    val split = dups1.flatMap { e =>
      if (e.inter.isEmpty) Iterator.empty
      else {
        val mid = e.inter.last
        Iterator(
          KeyedEdge(e.gid, e.src, mid, e.inter.init, e.wid),
          KeyedEdge(e.gid, mid, e.dst, Nil, e.wid))
      }
    }
    val (keep2, dups2) = dedupRound(keep1.union(split))
    // final fallback: fully expand anything still colliding
    val expanded = dups2.flatMap { e =>
      val chain = e.src +: e.inter :+ e.dst
      chain.sliding(2).collect {
        case Seq(a, b) if a != b => KeyedEdge(e.gid, a, b, Nil, e.wid)
      }
    }
    val (keep3, _) = dedupRound(keep2.union(expanded))
    keep3
  }
}
