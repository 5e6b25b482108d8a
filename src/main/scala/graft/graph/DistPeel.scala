package graft.graph

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed line peeling for components too large for one task
  * (SURVEY §7.5.4 — the mega-component `rows.toSeq` cliff measured in
  * round 3's percolated 16M run).
  *
  * The reference's P1 decomposition (`into_lines_random`,
  * /root/reference/src/graph/undirected_graph.rs:382-426) is an
  * UNSEEDED-RNG walk — any edge-disjoint trail decomposition is within
  * its contract, so a sharded deterministic decomposition is valid where
  * the single-task one cannot run. Small components keep the exact
  * `Local.peelLines` order (byte-parity with the pinned fixtures); this
  * operator is the scale path for components above a threshold:
  *
  *  1. edges are assigned a DETERMINISTIC chunk (caller-provided column —
  *     spatial cell + size-capped hash sub-bucket), each chunk ≤ the
  *     threshold;
  *  2. each (comp, chunk) peels locally into trails — O(chunk) task
  *     memory;
  *  3. per component, the trails' ENDPOINTS form a multigraph (one
  *     super-edge per trail) that a single task walks to stitch trails
  *     at cut vertexes — O(#trails) memory, loudly guarded;
  *  4. stitched lines are emitted as ordered SEGMENT runs (one row per
  *     underlying trail), so no row or task ever materializes a whole
  *     mega-component.
  *
  * The result is a pure function of the data (chunking, per-chunk peel
  * and stitching are all deterministic) — identical at any parallelism,
  * which the spec pins by re-running under different partition counts.
  */
object DistPeel {

  /** Deterministic trail decomposition of a MULTIGRAPH given as labelled
    * edges (eid, a, b) — the level-2 stitcher. Same heuristics as
    * [[Local.peelLines]] (sorted adjacency, degree-1 start preference
    * among the first 100 vertexes), generalized to parallel edges and
    * self-loops via edge ids. Returns walks of (eid, reversed).
    */
  def peelMultigraph(edges: Seq[(Long, Long, Long)]): Seq[Seq[(Long, Boolean)]] = {
    val byId = edges.map(e => e._1 -> (e._2, e._3)).toMap
    require(byId.size == edges.size, "duplicate super-edge ids")
    val adj = mutable.SortedMap.empty[Long, mutable.TreeSet[(Long, Long)]]
    edges.foreach { case (eid, a, b) =>
      adj.getOrElseUpdate(a, mutable.TreeSet.empty) += ((b, eid))
      if (a != b) adj.getOrElseUpdate(b, mutable.TreeSet.empty) += ((a, eid))
    }
    def consume(v: Long, entry: (Long, Long)): Unit = {
      adj.get(v).foreach { s =>
        s -= entry
        if (s.isEmpty) adj.remove(v)
      }
    }
    val out = mutable.ArrayBuffer.empty[Seq[(Long, Boolean)]]
    while (adj.nonEmpty) {
      val first100 = adj.keysIterator.take(100).toSeq
      val start = first100.find(v => adj(v).size == 1).getOrElse(adj.firstKey)
      val line = mutable.ArrayBuffer.empty[(Long, Boolean)]
      var cur = start
      var stuck = false
      while (!stuck) {
        adj.get(cur).flatMap(_.headOption) match {
          case Some((nxt, eid)) =>
            consume(cur, (nxt, eid))
            consume(nxt, (cur, eid))
            line += ((eid, byId(eid)._1 != cur))
            cur = nxt
          case None => stuck = true
        }
      }
      if (line.nonEmpty) out += line.toSeq
    }
    out.toSeq
  }

  /** Two-level distributed peel. Input: one row per contracted edge with
    * its EXPANDED geometry; output: stitched lines as ordered segment
    * runs. Segment k>0 begins with the same nid segment k−1 ends with
    * (the cut vertex) — a consumer assembling a full line drops the
    * first point of every non-first segment.
    *
    * @param edges (comp: Long, chunk: Long — deterministic, each chunk ≤
    *              the stitch guard; src, dst: Long; nids: Seq[Long] the
    *              expanded chain src…dst; lats, lons: Seq[Double])
    * @param maxStitch loud guard on per-component trail count: above it,
    *                  the stitch task itself would exceed one task's
    *                  memory — raise the chunk size / executor memory or
    *                  coarsen the chunk column (larger cells ⇒ fewer cut
    *                  vertexes ⇒ fewer trails)
    * @return (comp, line_idx, seg_idx, nids, lats, lons)
    */
  def peelSegments(
      edges: DataFrame,
      spark: SparkSession,
      maxStitch: Long = 8000000L): DataFrame = {
    import spark.implicits._
    // level 1: peel each chunk locally; one output row per trail,
    // geometry expanded in place (bounded by the chunk size)
    val level1 = edges
      .select("comp", "chunk", "src", "dst", "nids", "lats", "lons")
      .as[(Long, Long, Long, Long, Seq[Long], Seq[Double], Seq[Double])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Long, Long), rows) =>
        val (comp, chunk) = key
        val es = rows.toSeq
        val payload = es.map(e => ((e._3, e._4), (e._5, e._6, e._7))).toMap
        val walks = Local.peelLines(es.map(e => (e._3, e._4)))
        walks.iterator.zipWithIndex.map { case (walk, idx) =>
          val nids = mutable.ArrayBuffer.empty[Long]
          val lats = mutable.ArrayBuffer.empty[Double]
          val lons = mutable.ArrayBuffer.empty[Double]
          walk.sliding(2).foreach {
            case scala.collection.Seq(a, b) =>
              val (en, ela, elo) = payload.getOrElse((a, b),
                payload((b, a)) match {
                  case (n, la, lo) => (n.reverse, la.reverse, lo.reverse)
                })
              val from = if (nids.isEmpty) 0 else 1 // drop shared vertex
              nids ++= en.drop(from); lats ++= ela.drop(from); lons ++= elo.drop(from)
            case _ =>
          }
          (comp, chunk, idx.toLong, walk.head, walk.last, nids.toSeq,
            lats.toSeq, lons.toSeq)
        }
      }
      .toDF("comp", "chunk", "idx", "head", "last", "nids", "lats", "lons")
      .localCheckpoint(true)

    // level 2: stitch trails at cut vertexes — metadata only (endpoints),
    // O(#trails) per component, loudly guarded
    val stitched = level1
      .select("comp", "chunk", "idx", "head", "last")
      .as[(Long, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (comp, rows) =>
        val metas = mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
        rows.foreach { r =>
          metas += r
          if (metas.length > maxStitch)
            throw new IllegalStateException(
              s"component $comp produced more than $maxStitch trails to " +
                "stitch — one task cannot hold the stitch graph; coarsen " +
                "the chunk cells (fewer cut vertexes) or raise maxStitch " +
                "with more executor memory")
        }
        // super-edge id = (chunk, idx) packed; chunk and idx both bounded
        val superEdges = metas.map { case (_, chunk, idx, h, l) =>
          ((chunk << 20) | idx, h, l)
        }.toSeq
        require(metas.forall(_._3 < (1L << 20)),
          s"component $comp: >2^20 trails in one chunk — raise the chunk size")
        peelMultigraph(superEdges).iterator.zipWithIndex.flatMap {
          case (walk, lineIdx) =>
            walk.iterator.zipWithIndex.map { case ((eid, rev), segIdx) =>
              (comp, eid >> 20, eid & ((1L << 20) - 1),
                lineIdx.toLong, segIdx.toLong, rev)
            }
        }
      }
      .toDF("comp", "chunk", "idx", "line_idx", "seg_idx", "reversed")

    stitched
      .join(level1, Seq("comp", "chunk", "idx"))
      .select(col("comp"), col("line_idx"), col("seg_idx"),
        when(col("reversed"), reverse(col("nids"))).otherwise(col("nids")).as("nids"),
        when(col("reversed"), reverse(col("lats"))).otherwise(col("lats")).as("lats"),
        when(col("reversed"), reverse(col("lons"))).otherwise(col("lons")).as("lons"))
  }

  /** Deterministic size-capped chunk column for [[peelSegments]]:
    * spatial cell (locality ⇒ fewer cut vertexes on real geographic
    * networks) sub-bucketed by hash so no chunk exceeds `maxChunk` edges
    * even in a dense cell. `edges` needs (comp, src, dst, lat1, lon1).
    */
  def withChunk(edges: DataFrame, maxChunk: Long, cellDeg: Double = 0.25): DataFrame = {
    // two consumers (the sub-bucket counts and the join back): without
    // the checkpoint the caller's per-edge geometry aggregation ran
    // twice — the two branches don't share an exchange
    val celled = edges.withColumn("cell",
      (floor(col("lat1") / cellDeg) * 1441 + floor(col("lon1") / cellDeg))
        .cast("long"))
      .localCheckpoint(true)
    val counts = celled.groupBy("comp", "cell")
      .agg(count(lit(1)).as("n"))
      .withColumn("nsub",
        ceil(col("n").cast("double") / maxChunk).cast("long"))
      .select("comp", "cell", "nsub")
    celled.join(counts, Seq("comp", "cell"))
      .withColumn("chunk",
        col("cell") * 65536L + pmod(xxhash64(col("src"), col("dst")), col("nsub")))
      .drop("cell", "nsub")
  }
}
