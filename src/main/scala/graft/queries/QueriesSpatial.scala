package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.{CellIndex, SpatialJoins}
import Derived._

/** Spatial operator suite (north rule: cell index, cell join, kNN, PIP),
  * DuckDB-oracled. The cell id is pure integer bit-algebra, so the oracle
  * reproduces it bit-exactly; distances are integerised before compare.
  */
object QueriesSpatial {

  val CellRes = 12
  val JoinRes = 6
  val KnnRes = 7
  val PipRes = 6

  private def mmSql(e: String) = s"CAST(FLOOR(($e) * 1000 + 0.5) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Morton quadkey cell index over the derived nodes
    "q20_cell_index" -> ((s, d) =>
      nodesDF(s, d)
        .withColumn("cell", CellIndex.cellCol(col("lat"), col("lon"), CellRes))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), min("nid").as("min_nid"))),

    // points ⋈ nodes equi-join on cell id (the 10^12-row scale path)
    "q21_cell_join" -> ((s, d) =>
      SpatialJoins.cellJoin(
          pointsDF(s, d), "plat", "plon",
          nodesDF(s, d), "lat", "lon", JoinRes)
        .groupBy("pid")
        .agg(count(lit(1)).as("n_near"), min("nid").as("min_nid"))),

    // exact kNN via expanding cell rings vs brute-force oracle
    "q22_knn" -> ((s, d) =>
      SpatialJoins.knnJoin(pointsDF(s, d), nodesDF(s, d), KnnRes)
        .select(col("pid"), col("nn_nid"), expr(mmSql("dist_m")).as("dist_mm"))),

    // point-in-polygon containment join (cell prefilter + ray casting)
    "q23_pip" -> ((s, d) => {
      val boxes = boxesDF(s, d).collect().map { r =>
        val area = r.getString(0)
        val la = r.getDouble(1); val lo = r.getDouble(2)
        val ring = IndexedSeq(
          (la, lo), (la, lo + 12.0), (la + 8.0, lo + 12.0), (la + 8.0, lo),
          (la, lo))
        (area, ring)
      }.toSeq
      SpatialJoins.pipJoin(pointsDF(s, d), boxes, PipRes)
    }))

  val oracles: Map[String, String] = Map(
    "q20_cell_index" ->
      s"""WITH $oracleWaysCte
         |SELECT ${CellIndex.cellSql("lat", "lon", CellRes)} AS cell,
         |  COUNT(*) AS n, MIN(nid) AS min_nid
         |FROM nodes GROUP BY 1""".stripMargin,

    "q21_cell_join" ->
      s"""WITH $oracleWaysCte, $oraclePointsCte
         |SELECT pid, COUNT(*) AS n_near, MIN(nid) AS min_nid
         |FROM points JOIN nodes
         |  ON ${CellIndex.cellSql("plat", "plon", JoinRes)} =
         |     ${CellIndex.cellSql("lat", "lon", JoinRes)}
         |GROUP BY pid""".stripMargin,

    "q22_knn" ->
      s"""WITH $oracleWaysCte, $oraclePointsCte,
         |dists AS (
         |  SELECT pid, nid,
         |    ${haversineSql("plat", "plon", "lat", "lon")} AS dist,
         |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY
         |      ${haversineSql("plat", "plon", "lat", "lon")} ASC, nid ASC) AS rn
         |  FROM points CROSS JOIN nodes)
         |SELECT pid, nid AS nn_nid, ${mmSql("dist")} AS dist_mm
         |FROM dists WHERE rn = 1""".stripMargin,

    "q23_pip" ->
      s"""WITH $oracleWaysCte, $oraclePointsCte, $oracleBoxesCte
         |SELECT pid, area FROM points JOIN boxes
         |  ON plat >= latmin AND plat < latmin + 8.0
         | AND plon >= lonmin AND plon < lonmin + 12.0""".stripMargin)
}
