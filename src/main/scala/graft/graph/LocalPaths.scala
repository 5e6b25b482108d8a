package graft.graph

import scala.collection.mutable
import graft.geo.Geo

/** Path/geometry local algorithms (SURVEY §2.5 P2/P4/P5/P6/P7/P8) — pure
  * Scala, run per component inside `flatMapGroups`.
  */
object LocalPaths {

  type Pos = Map[Long, (Double, Double)] // nid → (lat, lon)

  private def hav(pos: Pos, a: Long, b: Long): Double = {
    val (la1, lo1) = pos(a); val (la2, lo2) = pos(b)
    Geo.haversineM(la1, lo1, la2, lo2)
  }

  /** P4 — A* with haversine heuristic (admissible: edge weights are
    * haversine lengths ≥ straight-line distance;
    * /root/reference/src/dij.rs:84-202). Returns the path or None.
    */
  def aStar(
      adj: Map[Long, Seq[(Long, Double)]],
      pos: Pos,
      source: Long,
      target: Long): Option[(Seq[Long], Double)] = {
    if (source == target) return Some((Seq(source), 0.0))
    if (!adj.contains(source) || !adj.contains(target)) return None
    val dist = mutable.HashMap[Long, Double](source -> 0.0)
    val parent = mutable.HashMap.empty[Long, Long]
    val closed = mutable.HashSet.empty[Long]
    // (f, g, node); min-heap via negated ordering
    val pq = mutable.PriorityQueue.empty[(Double, Double, Long)](
      Ordering.by[(Double, Double, Long), (Double, Long)](x => (-x._1, -x._3)))
    pq.enqueue((hav(pos, source, target), 0.0, source))
    while (pq.nonEmpty) {
      val (_, g, v) = pq.dequeue()
      if (v == target) {
        val path = mutable.ArrayBuffer(target)
        var cur = target
        while (cur != source) { cur = parent(cur); path += cur }
        return Some((path.reverse.toSeq, g))
      }
      if (!closed(v)) {
        closed += v
        for ((w, len) <- adj.getOrElse(v, Nil) if !closed(w)) {
          val ng = g + len
          if (ng < dist.getOrElse(w, Double.PositiveInfinity)) {
            dist(w) = ng
            parent(w) = v
            pq.enqueue((ng + hav(pos, w, target), ng, w))
          }
        }
      }
    }
    None
  }

  /** Build a symmetric adjacency with haversine edge weights. */
  def havAdjacency(edges: Seq[(Long, Long)], pos: Pos): Map[Long, Seq[(Long, Double)]] = {
    val m = mutable.HashMap.empty[Long, mutable.ArrayBuffer[(Long, Double)]]
    edges.foreach { case (a, b) =>
      if (a != b) {
        val d = hav(pos, a, b)
        m.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += ((b, d))
        m.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += ((a, d))
      }
    }
    m.view.mapValues(_.sortBy(x => (x._2, x._1)).toSeq).toMap
  }

  /** P2 — `into_lines_as_crow_flies`
    * (/root/reference/src/graph/undirected_graph.rs:428-482): find the
    * farthest vertex pair (max haversine), A* between them, emit the
    * path, remove its edges, recurse on remaining fragments.
    */
  def linesAsCrowFlies(edges: Seq[(Long, Long)], pos: Pos): Seq[Seq[Long]] = {
    val out = mutable.ArrayBuffer.empty[Seq[Long]]
    var remaining = edges.filter(e => e._1 != e._2)
    while (remaining.nonEmpty) {
      val verts = (remaining.map(_._1) ++ remaining.map(_._2)).distinct.sorted
      // farthest pair: O(V²) scan (reference does the same); the pair lies
      // on the hull for big components — optimisation left for later
      var best = (verts.head, verts.head, -1.0)
      for (i <- verts.indices; j <- (i + 1) until verts.length) {
        val d = hav(pos, verts(i), verts(j))
        if (d > best._3) best = (verts(i), verts(j), d)
      }
      val adj = havAdjacency(remaining, pos)
      aStar(adj, pos, best._1, best._2) match {
        case Some((path, _)) if path.length > 1 =>
          out += path
          val pathEdges = path.sliding(2).map(p =>
            (math.min(p(0), p(1)), math.max(p(0), p(1)))).toSet
          remaining = remaining.filter(e =>
            !pathEdges((math.min(e._1, e._2), math.max(e._1, e._2))))
        case _ =>
          // disconnected fragments: peel the component of the first vertex
          val comp = reachable(remaining, best._1)
          val (in, rest) = remaining.partition(e => comp(e._1))
          out ++= linesAsCrowFlies(in, pos)
          remaining = rest
      }
    }
    out.toSeq
  }

  private def reachable(edges: Seq[(Long, Long)], start: Long): Set[Long] = {
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val seen = mutable.HashSet(start)
    val stack = mutable.ArrayBuffer(start)
    while (stack.nonEmpty) {
      val v = stack.remove(stack.length - 1)
      adj.getOrElse(v, Nil).foreach { w =>
        if (!seen(w)) { seen += w; stack += w }
      }
    }
    seen.toSet
  }

  /** P6 — frames (/root/reference/src/way_group.rs:76-154): convex hull
    * of the component's vertex positions → A* between every hull-point
    * pair → union of path edges → peel into lines.
    */
  def frames(edges: Seq[(Long, Long)], pos: Pos): Seq[Seq[Long]] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    if (verts.length < 3) return Local.peelLines(edges)
    // hull over (lat, lon) points; map back to ALL nids at each hull point
    val byPoint = verts.groupBy(pos)
    val hullPts = Local.convexHull(verts.map(pos).distinct)
    val hullNids = hullPts.flatMap(p => byPoint.getOrElse(p, Nil).sorted.headOption)
    val adj = havAdjacency(edges, pos)
    val unionEdges = mutable.LinkedHashSet.empty[(Long, Long)]
    for (i <- hullNids.indices; j <- (i + 1) until hullNids.length) {
      aStar(adj, pos, hullNids(i), hullNids(j)).foreach { case (path, _) =>
        path.sliding(2).foreach {
          case Seq(a, b) => unionEdges += ((math.min(a, b), math.max(a, b)))
          case _ =>
        }
      }
    }
    Local.peelLines(unionEdges.toSeq)
  }

  /** [[frames]] over a chain-CONTRACTED multigraph (the DistContract
    * scale path): vertexes are pillars, edge weight = the haversine sum
    * along the contracted chain (≥ the endpoints' straight-line distance,
    * so the A* heuristic stays admissible), hull nids arrive precomputed
    * (distributed via DistHull; they are pillars by construction — the
    * contraction's keep set). Parallel chains keep only the least
    * (weight, inter) edge for pathfinding — a heavier parallel edge can
    * never lie on a shortest path — and chosen compressed edges expand to
    * their original segments before peeling, so the output lines are in
    * ORIGINAL node ids, same as [[frames]]. On components whose shortest
    * paths are unique the result is exactly [[frames]]' (spec-pinned);
    * under ties the A* web may pick a different equal-length route —
    * within the reference's frames contract either way.
    *
    * @param compEdges (src, dst, inter, len) contracted edges
    * @param hullNids  hull vertexes (pillars)
    * @param pos       pillar positions
    */
  def framesCompressed(
      compEdges: Seq[(Long, Long, Seq[Long], Double)],
      hullNids: Seq[Long],
      pos: Pos): Seq[Seq[Long]] = {
    val best = mutable.HashMap.empty[(Long, Long), (Double, Seq[Long])]
    compEdges.foreach { case (a0, b0, inter0, len) =>
      if (a0 != b0) {
        val (k, inter) =
          if (a0 <= b0) ((a0, b0), inter0) else ((b0, a0), inter0.reverse)
        val better = best.get(k).forall { case (l, iv) =>
          len < l || (len == l && Ordering.Implicits
            .seqOrdering[Seq, Long].lt(inter, iv))
        }
        if (better) best(k) = (len, inter)
      }
    }
    val adjM = mutable.HashMap.empty[Long, mutable.ArrayBuffer[(Long, Double)]]
    best.foreach { case ((a, b), (len, _)) =>
      adjM.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += ((b, len))
      adjM.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += ((a, len))
    }
    val adj = adjM.view.mapValues(_.sortBy(x => (x._2, x._1)).toSeq).toMap
    val hs = hullNids.distinct.sorted
    val union = mutable.LinkedHashSet.empty[(Long, Long)]
    for (i <- hs.indices; j <- (i + 1) until hs.length) {
      aStar(adj, pos, hs(i), hs(j)).foreach { case (path, _) =>
        path.sliding(2).foreach {
          case Seq(a, b) => union += ((math.min(a, b), math.max(a, b)))
          case _ =>
        }
      }
    }
    val expanded = union.iterator.flatMap { case (a, b) =>
      val chain = a +: best((a, b))._2 :+ b
      chain.sliding(2).map(p => (math.min(p(0), p(1)), math.max(p(0), p(1))))
    }.toSeq.distinct
    Local.peelLines(expanded)
  }

  /** P7 — farthest-point sampling, seeded and deterministic (the
    * reference uses an unseeded RNG, undirected_graph.rs:486-550 — we fix
    * the first point as the min nid so runs are reproducible; documented
    * deviation).
    */
  def farthestPointSample(verts: Seq[Long], pos: Pos, k: Int): Seq[Long] = {
    if (verts.isEmpty || k <= 0) return Nil
    val sorted = verts.distinct.sorted
    val chosen = mutable.ArrayBuffer(sorted.head)
    val minDist = mutable.HashMap.empty[Long, Double]
    sorted.foreach(v => minDist(v) = hav(pos, v, chosen.head))
    while (chosen.length < math.min(k, sorted.length)) {
      val next = sorted.maxBy(v => (minDist(v), -v))
      if (minDist(next) <= 0.0) return chosen.toSeq
      chosen += next
      sorted.foreach(v => minDist(v) = math.min(minDist(v), hav(pos, v, next)))
    }
    chosen.toSeq
  }

  /** P8 — betweenness centrality (Brandes accumulation over sampled
    * sources; the reference samples ≤ 2000 vertexes per component and
    * back-propagates path counts, undirected_graph.rs:552-638 +
    * main.rs:987-1156). Returns per-edge (canonical a<b) centrality.
    */
  def betweenness(
      edges: Seq[(Long, Long)],
      pos: Pos,
      maxSamples: Int = 2000): Map[(Long, Long), Double] = {
    val adj = havAdjacency(edges, pos)
    val verts = adj.keys.toSeq.sorted
    val samples = farthestPointSample(verts, pos, math.min(maxSamples, verts.length))
    betweennessWeighted(adj, samples)
  }

  /** Brandes over an explicit weighted adjacency and sample set — the
    * pre-pass (spike removal + compression, main.rs:1056-1096) hands in a
    * reduced graph whose edge weights are chain lengths.
    *
    * Pair counting matches the reference exactly once per unordered
    * sample pair: source `samples(i)` only accumulates dependencies for
    * targets `samples(i+1..)` (undirected_graph.rs:584
    * `target_nodes = &nodes[(i + 1)..]`). Every edge of `adj` is seeded
    * with 0.0 — the reference initialises `bc_res` over ALL compressed
    * edges (undirected_graph.rs:579-581), so zero-centrality edges are
    * emitted (0 passes the default min-value filter).
    */
  def betweennessWeighted(
      adj: Map[Long, Seq[(Long, Double)]],
      samples: Seq[Long]): Map[(Long, Long), Double] = {
    val score = mutable.HashMap.empty[(Long, Long), Double].withDefaultValue(0.0)
    for ((v, ns) <- adj; (w, _) <- ns)
      score((math.min(v, w), math.max(v, w))) = 0.0

    for (i <- samples.indices.dropRight(1)) {
      val s = samples(i)
      val targets = samples.drop(i + 1).toSet
      // Dijkstra with path counts
      val dist = mutable.HashMap[Long, Double](s -> 0.0)
      val sigma = mutable.HashMap[Long, Double](s -> 1.0).withDefaultValue(0.0)
      val preds = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
      val order = mutable.ArrayBuffer.empty[Long]
      val visited = mutable.HashSet.empty[Long]
      val pq = mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, -x._2)))
      pq.enqueue((0.0, s))
      while (pq.nonEmpty) {
        val (d, v) = pq.dequeue()
        if (!visited(v)) {
          visited += v
          order += v
          for ((w, len) <- adj.getOrElse(v, Nil)) {
            val nd = d + len
            val old = dist.getOrElse(w, Double.PositiveInfinity)
            if (nd < old - 1e-9) {
              dist(w) = nd
              sigma(w) = sigma(v)
              preds(w) = mutable.ArrayBuffer(v)
              pq.enqueue((nd, w))
            } else if (math.abs(nd - old) <= 1e-9 && !visited(w)) {
              sigma(w) += sigma(v)
              preds.getOrElseUpdate(w, mutable.ArrayBuffer.empty) += v
            }
          }
        }
      }
      // Brandes back-propagation, restricted to this source's target set
      // (each unordered sample pair contributes exactly once overall)
      val delta = mutable.HashMap.empty[Long, Double].withDefaultValue(0.0)
      for (w <- order.reverse if w != s) {
        val isTarget = if (targets(w)) 1.0 else 0.0
        for (v <- preds.getOrElse(w, Nil)) {
          val c = sigma(v) / sigma(w) * (isTarget + delta(w))
          val key = (math.min(v, w), math.max(v, w))
          score(key) += c
          delta(v) += c
        }
      }
    }
    score.toMap
  }
}
