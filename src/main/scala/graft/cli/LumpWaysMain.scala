package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.LumpWays
import graft.outputs.{GeoJson, Writers}

/** `osm-lump-ways` CLI-parity entry over parquet inputs: the input dir
  * must hold `ways.parquet` (wid, nids, tags, ts) and `nodes.parquet`
  * (nid, lat, lon) — the PBF scan replaced by a columnar scan, everything
  * downstream identical (SURVEY §3.1).
  *
  *   runMain graft.cli.LumpWaysMain -i DIR -o out.geojsons -f waterway=river -g name
  */
object LumpWaysMain {
  def main(argv: Array[String]): Unit = {
    Cli.parseLump(argv.toSeq) match {
      case Left(err) =>
        System.err.println(s"error: $err")
        sys.exit(2)
      case Right(args) =>
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
        val spark = SparkSession.builder()
          .master(s"local[$cpus]")
          .appName("graft-lump-ways")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.ansi.enabled", "false")
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try run(args, spark)
        finally spark.stop()
    }
  }

  def run(args: Cli.LumpArgs, spark: SparkSession): Unit = {
    val fmt = Cli.formatOf(args.outputFilename) match {
      case Left(e)  => throw new IllegalArgumentException(e)
      case Right(f) => f
    }
    val ways = spark.read.parquet(s"${args.inputFilename}/ways.parquet")
    val nodes = spark.read.parquet(s"${args.inputFilename}/nodes.parquet")
    val t0 = System.nanoTime()
    val cfg = args.config.copy(onlyNodeids = args.onlyTheseWayGroupsNodeid)
    val feats = LumpWays.features(ways, nodes, cfg, spark)
    // serialize per-row on executors, stream through toLocalIterator
    // — no full-result collect() anywhere on the sink path
    val lines = LumpWays.featureJson(feats).localCheckpoint(true)
    val nFeatures = lines.count()
    fmt match {
      case Cli.GeoJsonSeq =>
        Writers.writeGeoJsonSeq(lines, args.outputFilename, args.overwrite)
      case Cli.GeoJson =>
        Writers.writeGeoJson(lines, args.outputFilename, args.overwrite)
      case Cli.Csv =>
        throw new IllegalArgumentException(
          "csv output not supported for way groups")
    }
    // P6: frames output (main.rs:663-674; GeoJSONSeq only)
    args.outputFrames.foreach { path =>
      if (path == args.outputFilename)
        throw new IllegalArgumentException(
          s"Same value given for output filename & output-frames: $path")
      Writers.writeGeoJsonSeq(
        LumpWays.framesFeatureJson(feats, args.framesGroupMinLengthM,
          args.saveAsLinestrings),
        path, args.overwrite)
    }
    // P8: betweenness output with the reference's pre-pass +
    // min-value/min-fraction cutoffs (main.rs:987-1156)
    args.betweennessOutput.foreach { path =>
      val filtered = ways.filter(graft.tagfilter.TagFilterCompiler
        .passFilters(cfg.tagFilters, cfg.tagFilterFunc,
          org.apache.spark.sql.functions.col("tags")))
      val edges = filtered
        .selectExpr("posexplode(nids) AS (i, u)", "nids")
        .where("i < size(nids) - 1")
        .selectExpr("LEAST(u, nids[i + 1]) AS src",
          "GREATEST(u, nids[i + 1]) AS dst")
        .where("src <> dst").distinct()
      val b = graft.pipeline.Extras.betweenness(
        edges, nodes, spark, args.betweennessMaxNodes.toInt,
        args.betweennessMinValue, args.betweennessMinFraction)
      val feats = betweennessFeatures(b, nodes, spark)
      (Cli.formatOf(path) match {
        case Right(Cli.GeoJsonSeq) =>
          Writers.writeGeoJsonSeq(feats, path, args.overwrite)
        case _ => Writers.writeGeoJson(feats, path, args.overwrite)
      })
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val nWays = ways.count()
    println(f"[lump-ways] wrote $nFeatures features to ${args.outputFilename} " +
      f"($nWays ways in $secs%.1f s, ${nWays / secs}%.0f ways/sec)")
  }

  /** One LineString feature per scored edge, props in serde-alphabetical
    * order (main.rs:1134-1141: betweenness_value, max_betweenness_value,
    * betweenness_fraction, betweenness_fraction_max, 6 dp fractions).
    */
  private def betweennessFeatures(
      b: org.apache.spark.sql.DataFrame,
      nodes: org.apache.spark.sql.DataFrame,
      spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val maxV = b.agg(max("value")).head() match {
      case r if r.isNullAt(0) => 1.0
      case r => math.max(r.getDouble(0), 1e-12)
    }
    b.join(nodes.select(col("nid").as("src"), col("lat").as("slat"),
        col("lon").as("slon")), Seq("src"))
      .join(nodes.select(col("nid").as("dst"), col("lat").as("dlat"),
        col("lon").as("dlon")), Seq("dst"))
      .orderBy("comp", "src", "dst")
      .map { r =>
        val v = r.getAs[Double]("value")
        val props = Seq(
          "betweenness_value" -> GeoJson.numJson(v),
          "max_betweenness_value" -> GeoJson.numJson(maxV),
          "betweenness_fraction" ->
            GeoJson.numJson(graft.geo.Geo.roundHalfAway(r.getAs[Double]("value_fraction"), 6)),
          "betweenness_fraction_max" ->
            GeoJson.numJson(graft.geo.Geo.roundHalfAway(r.getAs[Double]("value_fraction_max"), 6)))
        GeoJson.feature(GeoJson.propsJson(props),
          GeoJson.lineString(Seq(
            (r.getAs[Double]("slon"), r.getAs[Double]("slat")),
            (r.getAs[Double]("dlon"), r.getAs[Double]("dlat")))))
      }
      .toDF("feature")
  }
}
