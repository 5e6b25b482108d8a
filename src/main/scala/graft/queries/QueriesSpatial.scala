package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.{CellIndex, Raster, SpatialJoins}
import Derived._

/** Spatial operator suite (north rule: cell index, cell join, kNN, PIP,
  * raster↔vector tiling), DuckDB-oracled. The cell id is pure integer
  * bit-algebra, so the oracle reproduces it bit-exactly; distances are
  * integerised before compare.
  */
object QueriesSpatial {

  val CellRes = 12
  val JoinRes = 6
  val KnnRes = 7
  val PipRes = 6
  val RasterRes = 6
  val VectorizeMinNodes = 2L

  private def mmSql(e: String) = s"CAST(FLOOR(($e) * 1000 + 0.5) AS BIGINT)"
  private def dmSql(e: String) = s"CAST(FLOOR(($e) * 10 + 0.5) AS BIGINT)"

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
      SpatialJoins.knnJoin(pointsDF(s, d), nodesDF(s, d), KnnRes,
          nodesCellOpt = Some(Derived.nodesCellMemo(s, d, KnnRes)))
        .select(col("pid"), col("nn_nid"), expr(mmSql("dist_m")).as("dist_mm"))),

    // vector → raster: way-density tiling (north rule raster path)
    "q54_rasterize" -> ((s, d) =>
      Raster.rasterize(nodesDF(s, d), edgesDF(s, d), RasterRes)
        .select(col("cell"), col("x"), col("y"), col("n_nodes"),
          col("n_edges"), expr(dmSql("len_sum")).as("len_dm"))),

    // raster → vector: threshold tiles → 4-neighbour CC blobs
    "q55_vectorize" -> ((s, d) => {
      val cells = nodesDF(s, d)
        .groupBy(CellIndex.xCol(col("lon"), RasterRes).as("x"),
          CellIndex.yCol(col("lat"), RasterRes).as("y"))
        .agg(count(lit(1)).as("v"))
        .select(CellIndex.packCol(col("x"), col("y"), RasterRes).as("cell"),
          col("x"), col("y"), col("v"))
      Raster.vectorize(cells, VectorizeMinNodes, RasterRes)
    }),

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
         | AND plon >= lonmin AND plon < lonmin + 12.0""".stripMargin,

    "q54_rasterize" ->
      s"""WITH $oracleWaysCte,
         |nc AS (
         |  SELECT ${CellIndex.xSql("lon", RasterRes)} AS x,
         |         ${CellIndex.ySql("lat", RasterRes)} AS y,
         |         COUNT(*) AS n_nodes
         |  FROM nodes GROUP BY 1, 2),
         |ec AS (
         |  SELECT ${CellIndex.xSql("(n1.lon + n2.lon) / 2.0", RasterRes)} AS x,
         |         ${CellIndex.ySql("(n1.lat + n2.lat) / 2.0", RasterRes)} AS y,
         |         COUNT(*) AS n_edges,
         |         SUM(${haversineSql("n1.lat", "n1.lon", "n2.lat", "n2.lon")}) AS len_sum
         |  FROM edges e
         |  JOIN nodes n1 ON n1.nid = e.src
         |  JOIN nodes n2 ON n2.nid = e.dst
         |  GROUP BY 1, 2)
         |SELECT ${CellIndex.packSql("COALESCE(nc.x, ec.x)", "COALESCE(nc.y, ec.y)", RasterRes)} AS cell,
         |  COALESCE(nc.x, ec.x) AS x, COALESCE(nc.y, ec.y) AS y,
         |  COALESCE(nc.n_nodes, 0) AS n_nodes,
         |  COALESCE(ec.n_edges, 0) AS n_edges,
         |  ${dmSql("COALESCE(ec.len_sum, 0.0)")} AS len_dm
         |FROM nc FULL OUTER JOIN ec ON nc.x = ec.x AND nc.y = ec.y""".stripMargin,

    "q55_vectorize" -> {
      val n = 1L << RasterRes
      s"""WITH RECURSIVE $oracleWaysCte,
         |cells AS MATERIALIZED (
         |  SELECT ${CellIndex.packSql(
                CellIndex.xSql("lon", RasterRes),
                CellIndex.ySql("lat", RasterRes), RasterRes)} AS cell,
         |    ${CellIndex.xSql("lon", RasterRes)} AS x,
         |    ${CellIndex.ySql("lat", RasterRes)} AS y,
         |    COUNT(*) AS v
         |  FROM nodes GROUP BY 1, 2, 3
         |  HAVING COUNT(*) >= $VectorizeMinNodes),
         |adj AS (
         |  SELECT a.cell AS src, b.cell AS dst FROM cells a JOIN cells b
         |    ON ((a.x + 1) % $n = b.x AND a.y = b.y)
         |    OR (a.x = (b.x + 1) % $n AND a.y = b.y)
         |    OR (a.x = b.x AND a.y + 1 = b.y)
         |    OR (a.x = b.x AND a.y = b.y + 1)),
         |r AS (
         |  SELECT cell AS nid, cell AS label FROM cells
         |  UNION
         |  SELECT a.dst, r.label FROM r JOIN adj a ON a.src = r.nid
         |  WHERE r.label < a.dst),
         |blobs AS (SELECT nid, MIN(label) AS blob FROM r GROUP BY nid)
         |SELECT b.blob, COUNT(*) AS n_cells,
         |  CAST(SUM(c.v) AS BIGINT) AS v_sum,
         |  MIN(c.x) AS min_x, MAX(c.x) AS max_x,
         |  MIN(c.y) AS min_y, MAX(c.y) AS max_y
         |FROM cells c JOIN blobs b ON b.nid = c.cell
         |GROUP BY b.blob""".stripMargin
    })
}
