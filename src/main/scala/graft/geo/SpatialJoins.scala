package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cell-indexed spatial joins (north rule: point-in-polygon containment,
  * kNN nearest-way lookup, executed as broadcast/sort-merge joins on cell
  * id; skew handled by AQE + explicit repartition on cell).
  */
object SpatialJoins {

  /** Equi-join two point sets on their cell id at `res`.
    * Both sides get a `cell` column; the join is a plain shuffled
    * equi-join that AQE can skew-split — this is the scale path for
    * "which ways are near this page" at 10^12 rows.
    */
  def cellJoin(
      left: DataFrame, latL: String, lonL: String,
      right: DataFrame, latR: String, lonR: String,
      res: Int): DataFrame = {
    val l = left.withColumn("cell", CellIndex.cellCol(col(latL), col(lonL), res))
    val r = right.withColumn("cell", CellIndex.cellCol(col(latR), col(lonR), res))
    l.join(r, "cell")
  }

  /** Exact nearest neighbour of every point among `nodes`, via expanding
    * Chebyshev rings on the cell grid (SURVEY.md §4.3 "kNN = expanding
    * ring of neighbouring cells").
    *
    * Exactness: a point is only resolved once its best candidate distance
    * is below the minimum possible distance to any cell outside the
    * searched disk (conservative metric bound); otherwise the radius
    * doubles. Distribution: candidates flow through cell equi-joins; the
    * driver loop runs O(log maxRadius) rounds, each a fully parallel join.
    *
    * @return (pid, nn_nid, dist_m) with deterministic (dist, nid) tie-break.
    */
  def knnJoin(
      points: DataFrame, // (pid, plat, plon)
      nodes: DataFrame,  // (nid, lat, lon)
      res: Int): DataFrame = {
    val spark = points.sparkSession
    val metresPerDegLat = math.Pi / 180.0 * Geo.EarthRadiusM // ≈ 111194.9
    val cellD = CellIndex.cellDeg(res)

    val nodesCell = nodes
      .withColumn("cell", CellIndex.cellCol(col("lat"), col("lon"), res))
      .localCheckpoint(true)

    val diskUdf = udf { (lat: Double, lon: Double, k: Int) =>
      CellIndex.disk(CellIndex.cell(lat, lon, res), k)
    }

    var unresolved = points.select("pid", "plat", "plon").localCheckpoint(true)
    var results: Option[DataFrame] = None
    var k = 1
    val maxK = (1L << res).toInt

    while (unresolved.take(1).nonEmpty) {
      val cand = unresolved
        .withColumn("cell", explode(diskUdf(col("plat"), col("plon"), lit(k))))
        .join(nodesCell, "cell")
        .withColumn("dist",
          Geo.haversineM(col("plat"), col("plon"), col("lat"), col("lon")))
      val best = cand
        .groupBy("pid", "plat", "plon")
        .agg(min(struct(col("dist"), col("nid"))).as("b"))
        .select(col("pid"), col("plat"), col("plon"),
          col("b.dist").as("dist"), col("b.nid").as("nid"))

      // Lower bound on the distance to anything outside the k-disk:
      //   lat axis:  k cells of cellD degrees
      //   lon axis:  k cells of 2·cellD degrees shrunk by cos(worst lat)
      val worstLat = least(abs(col("plat")) + lit((k + 1) * cellD), lit(89.9))
      val latBound = lit(k * cellD * metresPerDegLat)
      val lonBound = lit(k * 2 * cellD * metresPerDegLat) * cos(radians(worstLat))
      val bound = least(latBound, lonBound)
      val withFlag = best
        .withColumn("resolved",
          lit(k >= maxK) || col("dist") < bound)
        .localCheckpoint(true)

      val done = withFlag.filter(col("resolved"))
        .select(col("pid"), col("nid").as("nn_nid"), col("dist").as("dist_m"))
      results = Some(results.map(_.union(done)).getOrElse(done))

      val stillPoints = unresolved.join(
        withFlag.filter(col("resolved")).select("pid"), Seq("pid"), "left_anti")
      unresolved = stillPoints.localCheckpoint(true)
      // double the radius; at k ≥ maxK the disk covers the globe and the
      // `lit(k >= maxK)` flag force-resolves every remaining point
      k = math.min(k * 2, maxK)
    }
    results.getOrElse(
      points.sparkSession.emptyDataFrame
        .withColumn("pid", lit(0L)).withColumn("nn_nid", lit(0L))
        .withColumn("dist_m", lit(0.0)).limit(0))
  }

  /** Point-in-polygon containment join: polygons → cell covering
    * (broadcast), points → cell, exact ray-cast test.
    *
    * @param polygons (area, ring of (lat, lon)) — boundary sets are small
    *                 (hundreds of countries), so driver-side + broadcast.
    * @return (pid, area) one row per containment.
    */
  def pipJoin(
      points: DataFrame, // (pid, plat, plon)
      polygons: Seq[(String, IndexedSeq[(Double, Double)])],
      res: Int): DataFrame = {
    val spark = points.sparkSession
    val cover: Map[Long, Seq[Int]] = polygons.zipWithIndex
      .flatMap { case ((_, ring), i) => Polygon.coverCells(ring, res).map(_ -> i) }
      .groupBy(_._1)
      .map { case (c, xs) => (c, xs.map(_._2)) }
    val bCover = spark.sparkContext.broadcast(cover)
    val bPolys = spark.sparkContext.broadcast(polygons.toIndexedSeq)

    val matchUdf = udf { (lat: Double, lon: Double) =>
      val cell = CellIndex.cell(lat, lon, res)
      bCover.value.getOrElse(cell, Nil).collect {
        case i if Polygon.contains(bPolys.value(i)._2, lat, lon) =>
          bPolys.value(i)._1
      }
    }
    points
      .withColumn("area", explode(matchUdf(col("plat"), col("plon"))))
      .select("pid", "area")
  }
}
