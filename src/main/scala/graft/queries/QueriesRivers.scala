package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{DownOps, Flow, RiverRel}
import Derived._

/** D10/D13/D16 query entries over the derived graph. */
object QueriesRivers {

  private val tagSql = "CASE WHEN (src + dst) % 2 = 0 THEN 'a' ELSE 'b' END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D16 grouped waterways (SQL-checkable columns only)
    "q47_grouped_waterways" -> ((s, d) => {
      val tg = tagGroupTagged(s, d)
      val lens = dagEdgesDF(s, d).select("src", "dst", "len")
      // equal-split flows (memoised); tag-grouped split differs only at
      // multi-out nodes and is covered by the Flow fixtures
      val flows = dagUpstreamFlows(s, d).select("src", "dst", "flow_m")
      DownOps.groupedWaterways(tg, lens, flows)
        .select(col("tag"), col("tag_group_nid"), col("n_edges"),
          expr("CAST(FLOOR(cum_length_m * 10 + 0.5) AS BIGINT)").as("cum_len_dm"),
          expr("CAST(FLOOR(length_m * 10 + 0.5) AS BIGINT)").as("through_dm"),
          col("n_sources"), col("n_sinks"))
    }),

    // D10 grouped-ends lines (rows-only; walk pinned by DownOpsSpec)
    "q48_grouped_ends" -> ((s, d) => {
      val assign = dagEndAssignment(s, d)
      DownOps.groupedEnds(
        dagUpstreamFlows(s, d).select("src", "dst", "flow_m"), assign)
        .select(col("end_nid"), col("line_idx"), size(col("line")).as("n_pts"))
    }),

    // D13 river relationships (rows-only; rules pinned by DownOpsSpec)
    "q49_river_rels" -> ((s, d) => {
      RiverRel.classifyPairs(tagGroupTagged(s, d),
        dagEdgesDF(s, d).select("src", "dst", "len"))
    }))

  val oracles: Map[String, String] = Map(
    "q47_grouped_waterways" ->
      s"""WITH RECURSIVE $oracleWaysCte,
         |de AS (SELECT src, dst, $edgeLenSql AS len, $tagSql AS tag FROM edges),
         |sym2 AS (SELECT tag, src, dst FROM de UNION SELECT tag, dst, src FROM de),
         |r2 AS (
         |  SELECT tag, src AS nid, src AS label FROM sym2
         |  UNION
         |  SELECT s.tag, s.dst AS nid, r2.label FROM r2
         |    JOIN sym2 s ON s.src = r2.nid AND s.tag = r2.tag
         |  WHERE r2.label < s.dst),
         |tg AS (SELECT tag, nid, MIN(label) AS grp FROM r2 GROUP BY tag, nid),
         |ge AS (
         |  SELECT de.tag, tg.grp AS tag_group_nid, de.src, de.dst, de.len
         |  FROM de JOIN tg ON tg.tag = de.tag AND tg.nid = de.src),
         |counts AS (
         |  SELECT tag, tag_group_nid, COUNT(*) AS n_edges,
         |    CAST(FLOOR(SUM(len) * 10 + 0.5) AS BIGINT) AS cum_len_dm
         |  FROM ge GROUP BY tag, tag_group_nid),
         |grp_srcs AS (
         |  SELECT g.tag, g.tag_group_nid, g.src AS nid FROM ge g
         |  WHERE NOT EXISTS (SELECT 1 FROM ge h
         |    WHERE h.tag = g.tag AND h.tag_group_nid = g.tag_group_nid
         |      AND h.dst = g.src)),
         |grp_sinks AS (
         |  SELECT g.tag, g.tag_group_nid, g.dst AS nid FROM ge g
         |  WHERE NOT EXISTS (SELECT 1 FROM ge h
         |    WHERE h.tag = g.tag AND h.tag_group_nid = g.tag_group_nid
         |      AND h.src = g.dst)),
         |walks AS (
         |  SELECT g.tag, g.tag_group_nid, g.src AS nid, k.nid AS sink, g.len AS d
         |  FROM ge g JOIN grp_sinks k
         |    ON k.tag = g.tag AND k.tag_group_nid = g.tag_group_nid
         |   AND k.nid = g.dst
         |  UNION ALL
         |  SELECT g.tag, g.tag_group_nid, g.src, w.sink, g.len + w.d
         |  FROM walks w JOIN ge g
         |    ON g.tag = w.tag AND g.tag_group_nid = w.tag_group_nid
         |   AND g.dst = w.nid),
         |short AS (
         |  SELECT tag, tag_group_nid, nid, sink, MIN(d) AS d
         |  FROM walks GROUP BY tag, tag_group_nid, nid, sink),
         |through AS (
         |  SELECT s.tag, s.tag_group_nid,
         |    CAST(FLOOR(MAX(s.d) * 10 + 0.5) AS BIGINT) AS through_dm
         |  FROM short s JOIN grp_srcs src0
         |    ON src0.tag = s.tag AND src0.tag_group_nid = s.tag_group_nid
         |   AND src0.nid = s.nid
         |  GROUP BY s.tag, s.tag_group_nid),
         |nsrc AS (SELECT tag, tag_group_nid, COUNT(DISTINCT nid) AS n_sources
         |         FROM grp_srcs GROUP BY tag, tag_group_nid),
         |nsink AS (SELECT tag, tag_group_nid, COUNT(DISTINCT nid) AS n_sinks
         |          FROM grp_sinks GROUP BY tag, tag_group_nid)
         |SELECT c.tag, c.tag_group_nid, c.n_edges, c.cum_len_dm,
         |  COALESCE(t.through_dm, 0) AS through_dm,
         |  ns.n_sources, nk.n_sinks
         |FROM counts c
         |LEFT JOIN through t ON t.tag = c.tag AND t.tag_group_nid = c.tag_group_nid
         |JOIN nsrc ns ON ns.tag = c.tag AND ns.tag_group_nid = c.tag_group_nid
         |JOIN nsink nk ON nk.tag = c.tag AND nk.tag_group_nid = c.tag_group_nid"""
        .stripMargin)
}
