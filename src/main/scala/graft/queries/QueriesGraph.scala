package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graph.{ConnectedComponents, Flow, GraphBuild, Scc}
import graft.geo.Geo
import Derived._

/** Graph operator suite (SURVEY.md §2.3-2.6) over the derived graph, each
  * gated by a DuckDB oracle — including *recursive-CTE* oracles for the
  * iterative shuffle algorithms (CC labels, SCC, upstream propagation).
  */
object QueriesGraph {

  /** floor(x·10 + 0.5) decimetres — integerise before compare. */
  private def dmSql(e: String) = s"CAST(FLOOR(($e) * 10 + 0.5) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 degree census on the derived ways
    "q11_degree_census" -> ((s, d) =>
      GraphBuild.degreeCensus(waysDF(s, d))),

    // pillar-node fraction (graph-compression sanity, BASELINE.md)
    "q12_pillar_count" -> ((s, d) => {
      val census = GraphBuild.degreeCensus(waysDF(s, d))
      census.agg(
        sum(when(col("degree") =!= 2, 1L).otherwise(0L)).as("n_pillar"),
        count(lit(1)).as("n_nodes"))
    }),

    // C2 connected components — large-star/small-star iterative joins
    "q13_cc_labels" -> ((s, d) => ccLabels(s, d)),

    // C5 per-component length: Σ haversine over contracted edges
    "q14_comp_length" -> ((s, d) =>
      compLengths(s, d).select("comp", "n_edges", "len_dm")),

    // C11 rank / fraction properties over component lengths (two-phase
    // global rank — no single-partition window)
    "q15_rank_props" -> ((s, d) => {
      val lens = compLengths(s, d)
      val total = lens.agg(sum("len_dm")).head().getLong(0)
      graft.runtime.Ranks.withGlobalRowNumber(lens,
          Seq(col("len_dm").desc, col("comp").asc), "length_desc_rank",
          startAt = 0L)
        .withColumn("frac_bp",
          expr(s"CAST(FLOOR(len_dm * 10000.0 / $total + 0.5) AS BIGINT)"))
    }),

    // C7 IncludeTotalPercentage min-length mode (two-phase cumsum)
    "q16_min_length_pct" -> ((s, d) => {
      val lens = compLengths(s, d)
      val total = lens.agg(sum("len_dm")).head().getLong(0)
      val withCum = graft.runtime.Ranks.withGlobalCumsum(lens,
        Seq(col("len_dm").desc, col("comp").asc), col("len_dm"), "cum")
      val thresh = withCum
        .filter(col("cum") >= lit(0.9 * total))
        .agg(max("len_dm")).head().getLong(0)
      lens.filter(col("len_dm") >= thresh)
    }),

    // D7 end points (no outgoing edge) on the DAG orientation
    "q17_ends" -> ((s, d) => Flow.endPoints(dagEdgesDF(s, d))),

    // D5 upstream accumulation with equal flow splitting
    "q18_upstream" -> ((s, d) =>
      dagUpstreamNodes(s, d)
        .select(col("nid"), expr(dmSql("upstream_m")).as("up_dm"))),

    // D1 SCC (weak-CC shuffle + per-component Tarjan)
    "q19_scc" -> ((s, d) => sccCyclic(s, d)),

    // flagship end-to-end lump pipeline (rows-only: components, lengths,
    // ranks are individually oracled by q13-q16; geometry by LumpWaysSpec)
    "q35_lump_pipeline" -> ((s, d) => {
      val cfg = graft.pipeline.LumpWays.Config(
        tagFilters = Seq(graft.tagfilter.TagFilter.unsafeParse("status")),
        groupKeys = Seq(Seq("status")))
      // Scalar-only projection: the driver sorts rows for hashing and
      // chokes on array columns (round-1 q35 err); doubles are integerised.
      graft.pipeline.LumpWays.features(waysDF(s, d), nodesDF(s, d), cfg, s)
        .select(
          col("comp"), col("root_nodeid"), col("num_nodes"),
          concat_ws(";", col("grp")).as("grp_s"),
          expr(dmSql("length_m")).as("len_dm"),
          col("length_desc_rank"), col("length_asc_rank"),
          expr("CAST(FLOOR(length_m_fraction_total * 10000 + 0.5) AS BIGINT)").as("frac_total_bp"),
          expr("CAST(FLOOR(length_m_fraction_longest * 10000 + 0.5) AS BIGINT)").as("frac_longest_bp"))
    }))

  /** Memo for results shared across queries in one JVM (Verify/Bench run
    * every query against the same dir — CC would otherwise re-run 5×).
    * Cached frames are localCheckpoint'd, so they are lineage-free.
    */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def memoize(key: String)(f: => DataFrame): DataFrame =
    memo.computeIfAbsent(key, _ => f.localCheckpoint(true))

  def ccLabels(s: SparkSession, d: String): DataFrame =
    memoize(s"cc:$d") { ConnectedComponents.run(edgesDF(s, d)).labels }

  /** Shared: per-component integerised lengths. */
  def compLengths(s: SparkSession, d: String): DataFrame =
    memoize(s"complen:$d") { compLengthsUncached(s, d) }

  private def compLengthsUncached(s: SparkSession, d: String): DataFrame = {
    val labels = ccLabels(s, d)
    val nodes = nodesDF(s, d)
    edgesDF(s, d)
      .join(labels.withColumnRenamed("nid", "src"), Seq("src"))
      .join(nodes.select(col("nid").as("src"), col("lat").as("lat1"),
        col("lon").as("lon1")), Seq("src"))
      .join(nodes.select(col("nid").as("dst"), col("lat").as("lat2"),
        col("lon").as("lon2")), Seq("dst"))
      .withColumn("hv",
        Geo.haversineM(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .groupBy("comp")
      .agg(expr(dmSql("SUM(hv)")).as("len_dm"), count(lit(1)).as("n_edges"))
  }

  private val ccCte =
    s"""sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |r AS (
       |  SELECT src AS nid, src AS label FROM sym
       |  UNION
       |  SELECT s.dst AS nid, r.label FROM r JOIN sym s ON s.src = r.nid
       |  WHERE r.label < s.dst
       |),
       |cc AS (SELECT nid, MIN(label) AS comp FROM r GROUP BY nid)""".stripMargin

  private val compLenCte =
    s"""$ccCte,
       |clen AS (
       |  SELECT cc.comp AS comp,
       |    ${dmSql("SUM(" + haversineSql("n1.lat", "n1.lon", "n2.lat", "n2.lon") + ")")} AS len_dm,
       |    COUNT(*) AS n_edges
       |  FROM edges e
       |  JOIN cc ON cc.nid = e.src
       |  JOIN nodes n1 ON n1.nid = e.src
       |  JOIN nodes n2 ON n2.nid = e.dst
       |  GROUP BY cc.comp
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q11_degree_census" ->
      s"""WITH $oracleWaysCte
         |SELECT nid, CAST(LEAST(SUM(w), 255) AS BIGINT) AS degree FROM (
         |  SELECT ${nidSql("a0")} AS nid, 1 AS w FROM ways
         |  UNION ALL SELECT ${nidSql("b0")} AS nid, 2 AS w FROM ways
         |  UNION ALL SELECT ${nidSql("c0")} AS nid, 3 AS w FROM ways
         |) GROUP BY nid""".stripMargin,

    "q12_pillar_count" ->
      s"""WITH $oracleWaysCte,
         |census AS (
         |  SELECT nid, LEAST(SUM(w), 255) AS degree FROM (
         |    SELECT ${nidSql("a0")} AS nid, 1 AS w FROM ways
         |    UNION ALL SELECT ${nidSql("b0")} AS nid, 2 AS w FROM ways
         |    UNION ALL SELECT ${nidSql("c0")} AS nid, 3 AS w FROM ways
         |  ) GROUP BY nid)
         |SELECT CAST(SUM(CASE WHEN degree <> 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pillar,
         |       COUNT(*) AS n_nodes FROM census""".stripMargin,

    "q13_cc_labels" ->
      s"""WITH RECURSIVE $oracleWaysCte, $ccCte
         |SELECT nid, comp FROM cc""".stripMargin,

    "q14_comp_length" ->
      s"""WITH RECURSIVE $oracleWaysCte, $compLenCte
         |SELECT comp, n_edges, len_dm FROM clen""".stripMargin,

    "q15_rank_props" ->
      s"""WITH RECURSIVE $oracleWaysCte, $compLenCte,
         |tot AS (SELECT SUM(len_dm) AS t FROM clen)
         |SELECT comp, len_dm, n_edges,
         |  ROW_NUMBER() OVER (ORDER BY len_dm DESC, comp ASC) - 1
         |    AS length_desc_rank,
         |  CAST(FLOOR(len_dm * 10000.0 / (SELECT t FROM tot) + 0.5) AS BIGINT)
         |    AS frac_bp
         |FROM clen""".stripMargin,

    "q16_min_length_pct" ->
      s"""WITH RECURSIVE $oracleWaysCte, $compLenCte,
         |cum AS (
         |  SELECT comp, len_dm, n_edges,
         |    SUM(len_dm) OVER (ORDER BY len_dm DESC, comp ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM clen),
         |thresh AS (
         |  SELECT MAX(len_dm) AS th FROM cum
         |  WHERE cum >= 0.9 * (SELECT SUM(len_dm) FROM clen))
         |SELECT comp, len_dm, n_edges FROM clen
         |WHERE len_dm >= (SELECT th FROM thresh)""".stripMargin,

    "q17_ends" ->
      s"""WITH $oracleWaysCte
         |SELECT dst AS nid FROM edges
         |EXCEPT
         |SELECT src AS nid FROM edges""".stripMargin,

    "q18_upstream" ->
      s"""WITH RECURSIVE $oracleWaysCte,
         |de AS (SELECT src, dst, $edgeLenSql AS len FROM edges),
         |outdeg AS (SELECT src AS u, COUNT(*) AS od FROM de GROUP BY src),
         |contrib AS (
         |  SELECT dst AS nid, len AS amt FROM de
         |  UNION ALL
         |  SELECT e.dst, c.amt / o.od FROM contrib c
         |    JOIN de e ON e.src = c.nid
         |    JOIN outdeg o ON o.u = c.nid
         |)
         |SELECT n.nid AS nid, ${dmSql("COALESCE(s.up, 0.0)")} AS up_dm
         |FROM nodes n LEFT JOIN
         |  (SELECT nid, SUM(amt) AS up FROM contrib GROUP BY nid) s
         |  ON s.nid = n.nid""".stripMargin,

    "q19_scc" ->
      s"""WITH RECURSIVE $oracleWaysCte, $oracleCyclicCte,
         |reach AS (
         |  SELECT src AS a, dst AS b FROM dir_edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN dir_edges e ON e.src = r.b
         |),
         |mutual AS (
         |  SELECT r1.a AS nid, r1.b AS other
         |  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
         |  WHERE r1.a <> r1.b)
         |SELECT nid, CAST(LEAST(nid, MIN(other)) AS BIGINT) AS scc
         |FROM mutual GROUP BY nid""".stripMargin)
}
