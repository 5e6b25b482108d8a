package graft.graph

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.geo.Geo
import graft.outputs.GeoJson

/** D16 — grouped-waterways GeoJSON features with the FULL nested
  * relationship JSON (down/main.rs:1908-2229): per tag group a
  * MultiLineString feature carrying stream levels, upstream stats,
  * through-path length, and the tributaries / distributaries /
  * side-channel / parent-river arrays with per-confluence inflow/outflow
  * objects, sorted as the reference sorts them. Property keys are emitted
  * in serde_json's (BTreeMap) alphabetical order for byte parity.
  *
  * Scale shape: relationship metadata is GROUP-count-sized (named rivers
  * + their junction-incident edges — the reference itself holds all
  * `TagGroupInfo` in memory), so it is aggregated with DataFrame ops and
  * collected/broadcast; the geometry walk over every member edge stays
  * distributed per group (`flatMapGroups`).
  */
object WaterwayFeatures {

  final case class GMeta(
      gkey: String,
      tag: Option[String],
      gid: Long,            // deterministic dense internal_groupid
      minNid: Long,
      upstreamM: Double,    // Σ flow over the group's end segments
      confl: Set[Long],
      sinks: Set[Long])

  /** Group-count-sized metadata bundle shared by the grouped-waterways
    * features, the upstreams file, and longest-source-mouth follow rules.
    */
  final case class GroupBundle(
      metas: Array[GMeta],
      byKey: Map[String, GMeta],
      levels: Map[Long, (Int, Seq[Int])], // gid → (stream level, code)
      sideChannelGroups: Set[String])     // gkeys with a parent channel

  private def num(v: Double, dp: Int): String =
    GeoJson.numJson(Geo.roundHalfAway(v, dp))

  type ConfEdge = (String, Long, Long, Double, Double,
    (Double, Double), (Double, Double))

  /** Normalised edge frame: (gkey, tag, src, dst, len, flow). */
  def edgesWithMeta(
      tagGrouped: DataFrame, lens: DataFrame, flows: DataFrame): DataFrame =
    tagGrouped
      .withColumn("gkey", RiverRel.gkeyCol)
      .join(lens, Seq("src", "dst"))
      .join(flows, Seq("src", "dst"), "left")
      .select(col("gkey"), col("tag"), col("src"), col("dst"),
        col("len").cast("double"),
        coalesce(col("flow_m"), lit(0.0)).cast("double").as("flow"))
      .localCheckpoint(true)

  /** Collect the group-count-sized metadata: per-group info, stream
    * levels, relationship classification, junction-incident edges.
    */
  def groupBundle(
      tagGrouped: DataFrame, lens: DataFrame, flows: DataFrame,
      nodes: DataFrame)
      : (DataFrame, GroupBundle, Array[(String, String, String)],
        Map[String, Array[ConfEdge]]) = {
    val spark = tagGrouped.sparkSession
    val e = edgesWithMeta(tagGrouped, lens, flows)

    // end segments (tag_group.rs:112-134): edges with no same-TAG-value
    // out-edge at dst; group upstream = Σ their flows (tag_group.rs:240-248)
    val endSegs = e.as("a").join(e.as("b"),
      col("b.src") === col("a.dst") && col("b.tag") <=> col("a.tag"),
      "left_anti")
    val upstreamPerG = endSegs.groupBy("gkey").agg(sum("flow").as("up"))
    val sinksPerG = e.select(col("gkey"), col("dst").as("nid")).distinct()
      .join(e.select(col("src").as("nid")).distinct(), Seq("nid"), "left_anti")
      .groupBy("gkey").agg(collect_set("nid").as("sinks"))
    val conflPerG = RiverRel.confluencesOf(e)
      .groupBy("gkey").agg(collect_set("nid").as("confl"))
    val metaRows = e.groupBy("gkey")
      .agg(first("tag").as("tag"), least(min("src"), min("dst")).as("min_nid"))
      .join(upstreamPerG, Seq("gkey"), "left")
      .join(sinksPerG, Seq("gkey"), "left")
      .join(conflPerG, Seq("gkey"), "left")
      .collect()
    val metas0 = metaRows.map { r =>
      GMeta(r.getAs[String]("gkey"), Option(r.getAs[String]("tag")),
        0L, r.getAs[Long]("min_nid"),
        Option(r.get(r.fieldIndex("up"))).map(_.asInstanceOf[Double]).getOrElse(0.0),
        Option(r.getAs[collection.Seq[Long]]("confl")).map(_.toSet).getOrElse(Set.empty),
        Option(r.getAs[collection.Seq[Long]]("sinks")).map(_.toSet).getOrElse(Set.empty))
    }.sortBy(m => (m.tag.isDefined, m.tag.getOrElse(""), m.minNid))
    val metas = metas0.zipWithIndex.map { case (m, i) => m.copy(gid = i.toLong) }
    val byKey = metas.map(m => m.gkey -> m).toMap

    // junction-incident + sink-incident edges (with positions) — the raw
    // material for the per-confluence JSON objects; junction-count-sized
    val wantedNids = (metas.flatMap(_.confl) ++ metas.flatMap(_.sinks)).toSet
    val bWanted = spark.sparkContext.broadcast(wantedNids)
    val n1 = nodes.select(col("nid").as("src"), col("lat").as("slat"), col("lon").as("slon"))
    val n2 = nodes.select(col("nid").as("dst"), col("lat").as("dlat"), col("lon").as("dlon"))
    val conflEdges = e
      .filter(udf((s: Long, d: Long) =>
        bWanted.value.contains(s) || bWanted.value.contains(d)).apply(col("src"), col("dst")))
      .join(n1, Seq("src")).join(n2, Seq("dst"))
      .select("gkey", "src", "dst", "flow", "len", "slat", "slon", "dlat", "dlon")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), (r.getDouble(5), r.getDouble(6)),
        (r.getDouble(7), r.getDouble(8))))
    val edgesByG: Map[String, Array[ConfEdge]] = conflEdges.groupBy(_._1)

    // relationships (D13) — drives the tributary/distributary arrays
    val rels = RiverRel.classifyPairs(tagGrouped, lens).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

    // stream levels (D14, tag_group.rs:468-536): roots = groups with
    // sinks, BFS by confluence in-flow, upstream-desc child order.
    // Indexed by in-edge dst first — a flat scan per (group, confluence)
    // would be quadratic in junction count.
    val groupsInAt: Map[Long, Seq[String]] = edgesByG.values.flatten.toSeq
      .groupBy(_._3).view.mapValues(_.map(_._1).distinct).toMap
    val groupFlows = for {
      parent <- metas.toSeq
      nid <- parent.confl
      child <- groupsInAt.getOrElse(nid, Nil)
      if child != parent.gkey
    } yield (parent.gid, byKey(child).gid)
    val levels = DownOps.streamLevels(
      groupFlows.distinct,
      metas.map(m => m.gid -> m.upstreamM).toMap,
      metas.filter(_.sinks.nonEmpty).map(_.gid).toSeq)
    val sideChannelGroups = rels.collect {
      case (rel, a, _) if rel == RiverRel.ASideChannelB => a
    }.toSet
    (e, GroupBundle(metas, byKey, levels, sideChannelGroups), rels, edgesByG)
  }

  /** @param tagGrouped (src, dst, tag nullable, tag_group_nid)
    * @param lens (src, dst, len)
    * @param flows (src, dst, flow_m) — per-edge upstream
    * @param nodes (nid, lat, lon)
    * @return (gkey, feature) one pre-serialized Feature per tag group,
    *         minus groups dropped by `minLengthM`
    */
  def groupedWaterwayFeatures(
      tagGrouped: DataFrame,
      lens: DataFrame,
      flows: DataFrame,
      nodes: DataFrame,
      minLengthM: Option[Double] = None,
      precomputed: Option[(DataFrame, GroupBundle,
        Array[(String, String, String)], Map[String, Array[ConfEdge]])] = None)
      : DataFrame = {
    val spark = tagGrouped.sparkSession
    import spark.implicits._
    val (e, bundle, rels, edgesByG) =
      precomputed.getOrElse(groupBundle(tagGrouped, lens, flows, nodes))
    val metas = bundle.metas
    val byKey = bundle.byKey
    val levels = bundle.levels
    val n1 = nodes.select(col("nid").as("src"), col("lat").as("slat"), col("lon").as("slon"))
    val n2 = nodes.select(col("nid").as("dst"), col("lat").as("dlat"), col("lon").as("dlon"))

    def rel(relName: String): Seq[(String, String)] =
      rels.toSeq.collect { case (`relName`, a, b) => (a, b) }
    def sortedPeers(pairs: Seq[String]): Seq[GMeta] =
      pairs.distinct.flatMap(byKey.get).sortBy(_.gid)
    val tributariesOf = rel(RiverRel.ATributaryB).groupBy(_._2)
      .view.mapValues(ps => sortedPeers(ps.map(_._1))).toMap
    val branchingOf = rel(RiverRel.ABranchingDistributaryB).groupBy(_._2)
      .view.mapValues(ps => sortedPeers(ps.map(_._1))).toMap
    val terminalOf = rel(RiverRel.ATerminalDistributaryB).groupBy(_._2)
      .view.mapValues(ps => sortedPeers(ps.map(_._1))).toMap
    val sideChannelsOf = rel(RiverRel.ASideChannelB).groupBy(_._2)
      .view.mapValues(ps => sortedPeers(ps.map(_._1))).toMap
    val parentRiversOf =
      (rel(RiverRel.ATributaryB) ++ rel(RiverRel.ABranchingDistributaryB) ++
        rel(RiverRel.ATerminalDistributaryB)).groupBy(_._1)
        .view.mapValues(ps => sortedPeers(ps.map(_._2))).toMap

    // per-confluence JSON (down/main.rs:1937-1945 seg_to_distrib_json):
    // {lat, lon, nid, upstream_m} at the chosen endpoint of each
    // peer-group edge incident to a shared confluence node
    def confJson(
        peer: String, shared: Set[Long], atDst: Boolean, inclLen: Boolean)
        : Seq[(String, Double)] =
      edgesByG.getOrElse(peer, Array.empty[(String, Long, Long, Double, Double,
          (Double, Double), (Double, Double))]).toSeq
        .filter(x => shared.contains(x._2) || shared.contains(x._3))
        .sortBy(x => (x._2, x._3))
        .map { case (_, s, d, flow, len, spos, dpos) =>
          val (nid, pos) = if (atDst) (d, dpos) else (s, spos)
          val up = flow + (if (inclLen) len else 0.0)
          (GeoJson.propsJson(Seq(
            "lat" -> num(pos._1, 7), "lon" -> num(pos._2, 7),
            "nid" -> nid.toString, "upstream_m" -> num(up, 1))), up)
        }

    def peerEntry(
        m: GMeta, peer: GMeta, atDst: Boolean, inclLen: Boolean,
        flowKey: Option[String], idxKey: Option[String],
        peerEdgesOf: String): (String, Double) = {
      val shared = m.confl intersect peer.confl
      val confs = confJson(peerEdgesOf, shared, atDst, inclLen)
      val total = confs.map(_._2).sum
      val kvs = Seq(
        "confluences" -> confs.map(_._1).mkString("[", ",", "]"),
        "min_nid" -> peer.minNid.toString,
        "stream_level_code" ->
          levels.get(peer.gid).map(_._2.mkString("[", ",", "]")).getOrElse("[]"),
        "tag_group_value" ->
          peer.tag.map(GeoJson.jsonStr).getOrElse("null")) ++
        flowKey.map(k => k -> num(total, 1)).toSeq ++
        idxKey.map(k => k -> peer.gid.toString).toSeq
      (GeoJson.propsJson(kvs), total)
    }

    def entriesSortedByFlow(xs: Seq[(String, Double)]): String =
      xs.sortBy(-_._2).map(_._1).mkString("[", ",", "]")

    val propsByKey: Map[String, Map[String, String]] = metas.map { m =>
      val tribs = tributariesOf.getOrElse(m.gkey, Nil)
        .map(t => peerEntry(m, t, atDst = true, inclLen = true,
          Some("inflow_m"), None, t.gkey))
      val branching = branchingOf.getOrElse(m.gkey, Nil)
        .map(d => peerEntry(m, d, atDst = false, inclLen = false,
          Some("outflow_m"), Some("dist_tg_idx"), d.gkey))
      val terminal = terminalOf.getOrElse(m.gkey, Nil)
        .map(d => peerEntry(m, d, atDst = false, inclLen = false,
          Some("outflow_m"), Some("dist_tg_idx"), d.gkey))
      // parent_rivers: confluence objects are THIS group's edges at the
      // shared nodes (main.rs:2195-2224), insertion order (no flow sort)
      val parents = parentRiversOf.getOrElse(m.gkey, Nil)
        .map(p => peerEntry(m, p, atDst = false, inclLen = false,
          None, None, m.gkey)._1)
      // distributaries_sea: this group's in-edges of its sink nodes
      val sea = confJson(m.gkey, m.sinks, atDst = true, inclLen = true)
        .sortBy(-_._2).map(_._1)
      val base = Seq(
        "internal_groupid" -> m.gid.toString,
        "min_nid" -> m.minNid.toString,
        "tag_group_value" -> m.tag.map(GeoJson.jsonStr).getOrElse("null"),
        "tributaries" -> entriesSortedByFlow(tribs),
        "branching_distributaries" -> entriesSortedByFlow(branching),
        "terminal_distributaries" -> entriesSortedByFlow(terminal),
        "parent_rivers" -> parents.mkString("[", ",", "]"),
        "side_channels" -> sideChannelsOf.getOrElse(m.gkey, Nil)
          .map(_.gid).mkString("[", ",", "]"),
        "distributaries_sea" -> sea.mkString("[", ",", "]")) ++
        levels.get(m.gid).toSeq.flatMap { case (lvl, code) => Seq(
          "stream_level" -> lvl.toString,
          "stream_level_code" -> code.mkString("[", ",", "]"),
          "stream_level_code_str" ->
            GeoJson.jsonStr(DownOps.streamLevelCodeStr(code)))
        }
      m.gkey -> base.toMap
    }.toMap
    val bProps = spark.sparkContext.broadcast(propsByKey)
    val minLen = minLengthM

    // ---- distributed per-group geometry + local stats ------------------
    e.join(n1, Seq("src")).join(n2, Seq("dst"))
      .select(col("gkey"), col("src"), col("dst"), col("flow"), col("len"),
        col("slat"), col("slon"), col("dlat"), col("dlon"))
      .as[(String, Long, Long, Double, Double, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (gkey, it) =>
        val es = it.toSeq
        val pos = (es.map(r => (r._2, (r._6, r._7))) ++
          es.map(r => (r._3, (r._8, r._9)))).toMap
        val cum = es.map(_._5).sum
        if (minLen.exists(cum < _)) Iterator.empty
        else {
          // line walk (main.rs:1964-2004): start at end segments (no
          // same-group out-edge at dst), follow unused in-edges of the
          // same group; branches queue as new line starts. Deterministic
          // in-edge pick: (flow desc, src asc).
          val srcSet = es.map(_._2).toSet
          val used = scala.collection.mutable.HashSet.empty[(Long, Long)]
          val byDst = es.groupBy(_._3)
          val ends = es.filterNot(x => srcSet.contains(x._3))
            .map(x => (x._2, x._3)).sortBy(identity)
          val stack = scala.collection.mutable.Stack
            .empty[(Long, Long)]
          stack.pushAll(ends.reverse)
          val lines = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
          while (stack.nonEmpty) {
            var seg = stack.pop()
            if (!used(seg)) {
              val line = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
              var continue = true
              while (continue) {
                if (used(seg)) continue = false
                else {
                  line += seg
                  used += seg
                  val ins = byDst.getOrElse(seg._1, Nil)
                    .map(x => (x._2, x._3, x._4))
                    .filterNot(x => used((x._1, x._2)))
                    .sortBy(x => (-x._3, x._1))
                  if (ins.isEmpty) continue = false
                  else {
                    stack.pushAll(ins.drop(1).map(x => (x._1, x._2)).reverse)
                    seg = (ins.head._1, ins.head._2)
                  }
                }
              }
              if (line.nonEmpty) lines += (line.last._1 +: line.reverse.map(_._2).toSeq)
            }
          }
          // any edges unreachable from an end segment (pure cycles —
          // contracted earlier, but be safe): one 2-point line each
          es.filterNot(x => used((x._2, x._3))).sortBy(x => (x._2, x._3))
            .foreach(x => lines += Seq(x._2, x._3))

          val flowsMap = es.map(x => ((x._2, x._3), x._4)).toMap
          val lensMap = es.map(x => ((x._2, x._3), x._5)).toMap
          val ups = es.map(_._4)
          // through-path: max over sources of shortest dist to a sink
          // (floods from the smaller endpoint side)
          val srcs = es.map(_._2).distinct.filterNot(n => es.exists(_._3 == n))
          val sinks = es.map(_._3).distinct.filterNot(n => es.exists(_._2 == n))
          val through = DownOps.throughPathLength(
            es.map(x => (x._2, x._3, x._5)), srcs, sinks)
          if (minLen.exists(through < _)) Iterator.empty
          else {
            val stats = Seq(
              "cum_length_m" -> num(cum, 1),
              "length_m" -> num(through, 1),
              "min_upstream_m" -> num(if (ups.isEmpty) 0.0 else ups.min, 1),
              "max_upstream_m" -> num(if (ups.isEmpty) 0.0 else ups.max, 1),
              "mean_upstream_m" ->
                num(if (ups.isEmpty) 0.0 else ups.sum / ups.length, 1))
            val props = bProps.value.getOrElse(gkey, Map.empty) ++ stats
            val coords = lines.toSeq.map(_.map(n => (pos(n)._2, pos(n)._1)))
            Iterator((gkey, GeoJson.feature(
              GeoJson.propsJson(props), GeoJson.multiLineString(coords))))
          }
        }
      }
      .toDF("gkey", "feature")
  }

  /** Upstreams-file features (down/main.rs:1810-1860): one 2-point
    * LineString per flow segment with `nids`, `from_upstream_m`,
    * `to_upstream_m`, optional `from_upstream_m_<N>` multiples,
    * `flow_tag_group` / `tag_group_value` / `stream_level*` from the
    * edge's tag group, and the assigned end's nid / upstream / tags.
    * Keys in serde alphabetical order.
    *
    * @param e (gkey, tag, src, dst, len, flow) from [[edgesWithMeta]]
    * @param assignment (nid, end_nid)
    * @param endMeta (end_nid, end_upstream_m, tag_<key>…)
    */
  def upstreamFeatures(
      e: DataFrame,
      assignment: DataFrame,
      endMeta: DataFrame,
      nodes: DataFrame,
      bundle: GroupBundle,
      endTagKeys: Seq[String],
      minUpstreamM: Option[Double] = None,
      fromUpstreamMultiples: Seq[Double] = Nil): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // dense flow_tag_group id per distinct tag value (reference: tagid)
    val tagIds = bundle.metas.flatMap(_.tag).distinct.sorted.zipWithIndex.toMap
    val info = bundle.metas.map { m =>
      m.gkey -> (m.tag, bundle.levels.get(m.gid))
    }.toMap
    val bInfo = spark.sparkContext.broadcast((tagIds, info))
    val n1 = nodes.select(col("nid").as("src"), col("lat").as("slat"), col("lon").as("slon"))
    val n2 = nodes.select(col("nid").as("dst"), col("lat").as("dlat"), col("lon").as("dlon"))
    val tagCols = endTagKeys.map(k => s"tag_$k")
    val meta = endMeta.select(
      (col("end_nid") +: col("end_upstream_m").cast("double") +:
        tagCols.map(col)): _*)
    val base = e
      .filter(minUpstreamM
        .map(m => col("flow") >= m || (col("flow") + col("len")) >= m)
        .getOrElse(lit(true)))
      .join(assignment.select(col("nid").as("dst"), col("end_nid")), Seq("dst"), "left")
      .join(meta, Seq("end_nid"), "left")
      .join(n1, Seq("src")).join(n2, Seq("dst"))
    base.select((Seq(col("gkey"), col("src"), col("dst"), col("flow"),
        col("len"), col("slat"), col("slon"), col("dlat"), col("dlon"),
        col("end_nid"), col("end_upstream_m")) ++ tagCols.map(col)): _*)
      .map { r =>
        val (tagIdsV, infoV) = bInfo.value
        val gkey = r.getString(0)
        val (src, dst) = (r.getLong(1), r.getLong(2))
        val (flow, len) = (r.getDouble(3), r.getDouble(4))
        val to = flow + len
        val (tag, lvl) = infoV.getOrElse(gkey, (None, None))
        val props = Seq(
          "nids" -> GeoJson.jsonStr(s"$src,$dst"),
          "from_upstream_m" -> num(flow, 1),
          "to_upstream_m" -> num(to, 1),
          "flow_tag_group" ->
            tag.flatMap(tagIdsV.get).map(_.toString).getOrElse("null"),
          "tag_group_value" -> tag.map(GeoJson.jsonStr).getOrElse("null"),
          "stream_level" -> lvl.map(_._1.toString).getOrElse("null"),
          "stream_level_code" ->
            lvl.map(_._2.mkString("[", ",", "]")).getOrElse("null"),
          "stream_level_code_str" -> lvl
            .map(l => GeoJson.jsonStr(DownOps.streamLevelCodeStr(l._2)))
            .getOrElse("null"),
          "end_nid" ->
            (if (r.isNullAt(9)) "null" else r.getLong(9).toString),
          "end_upstream_m" ->
            (if (r.isNullAt(10)) "null" else num(r.getDouble(10), 1))) ++
          // key uses Rust Display of the multiple ("100", not "100.0");
          // value is the rounded multiple, serde-serialized
          fromUpstreamMultiples.map(m =>
            s"from_upstream_m_${graft.outputs.Writers.rustNum(m)}"
              -> GeoJson.numJson(Geo.roundMult(flow, m))) ++
          endTagKeys.zipWithIndex.collect {
            case (k, i) if !r.isNullAt(11 + i) =>
              s"end_tag:$k" -> GeoJson.jsonStr(r.getString(11 + i))
          }
        val coords = Seq((r.getDouble(6), r.getDouble(5)),
          (r.getDouble(8), r.getDouble(7)))
        (src, dst, flow,
          GeoJson.feature(GeoJson.propsJson(props), GeoJson.lineString(coords)))
      }
      .toDF("src", "dst", "from_upstream_m", "feature")
  }
}
