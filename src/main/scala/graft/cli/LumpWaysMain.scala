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
        val fmt = Cli.formatOf(args.outputFilename) match {
          case Left(e)  => System.err.println(s"error: $e"); sys.exit(2); return
          case Right(f) => f
        }
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
        try {
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
              System.err.println("error: csv output not supported for way groups")
              sys.exit(2)
          }
          val secs = (System.nanoTime() - t0) / 1e9
          val nWays = ways.count()
          println(f"[lump-ways] wrote $nFeatures features to ${args.outputFilename} " +
            f"($nWays ways in $secs%.1f s, ${nWays / secs}%.0f ways/sec)")
        } finally spark.stop()
    }
  }
}
