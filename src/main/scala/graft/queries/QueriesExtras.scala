package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Extras
import Derived._

/** Frames / betweenness / longest-source-mouth query entries.
  *
  * q44 (frames = convex-hull + A*-route union) and q45 (Brandes
  * betweenness: per-source shortest-path COUNTING + dependency
  * accumulation) are the two deliberately oracle-less queries: neither is
  * expressible in DuckDB SQL (recursive CTEs can enumerate shortest
  * distances but not Brandes' σ/δ accumulation or the hull+A* geometry),
  * so the driver records a rows-only check and the exact values are
  * pinned by LocalPathsSpec fixtures instead. Every other query carries
  * a full DuckDB oracle. The longest source→mouth (q46) gets a
  * recursive-CTE oracle.
  */
object QueriesExtras {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P6 frames per component (rows-only)
    "q44_frames" -> ((s, d) =>
      Extras.frames(edgesDF(s, d), nodesDF(s, d), s)
        .select(col("comp"), col("line_idx"), size(col("line")).as("n_pts"))),

    // P8 betweenness per component (rows-only; sampled=full here)
    "q45_betweenness" -> ((s, d) =>
      Extras.betweenness(edgesDF(s, d), nodesDF(s, d), s)
        .select(col("comp"), col("src"), col("dst"),
          expr("CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)").as("value_e3"))),

    // D17 longest source→mouth per basin
    "q46_longest_source_mouth" -> ((s, d) =>
      Extras.longestSourceMouth(dagEdgesDF(s, d), s)
        .select(col("mouth"), col("source"),
          expr("CAST(FLOOR(dist_m * 10 + 0.5) AS BIGINT)").as("dist_dm"))))

  val oracles: Map[String, String] = Map(
    "q46_longest_source_mouth" ->
      s"""WITH RECURSIVE $oracleWaysCte,
         |de AS (SELECT src, dst, $edgeLenSql AS len FROM edges),
         |mouths AS (SELECT DISTINCT dst AS nid FROM de
         |           WHERE dst NOT IN (SELECT src FROM de)),
         |srcs AS (SELECT DISTINCT src AS nid FROM de
         |         WHERE src NOT IN (SELECT dst FROM de)),
         |walks AS (
         |  SELECT e.src AS nid, e.dst AS mouth, e.len AS d
         |  FROM de e JOIN mouths m ON m.nid = e.dst
         |  UNION ALL
         |  SELECT e.src, w.mouth, e.len + w.d
         |  FROM walks w JOIN de e ON e.dst = w.nid),
         |short AS (
         |  SELECT nid, mouth, MIN(d) AS d FROM walks GROUP BY nid, mouth),
         |cand AS (
         |  SELECT s.mouth, s.nid AS source, s.d,
         |    ROW_NUMBER() OVER (PARTITION BY s.mouth
         |      ORDER BY s.d DESC, s.nid ASC) AS rn
         |  FROM short s JOIN srcs ON srcs.nid = s.nid)
         |SELECT mouth, source, CAST(FLOOR(d * 10 + 0.5) AS BIGINT) AS dist_dm
         |FROM cand WHERE rn = 1""".stripMargin)
}
