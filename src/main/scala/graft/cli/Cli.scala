package graft.cli

import graft.pipeline.LumpWays
import graft.tagfilter.{TagFilter, TagFilterFunc}

/** CLI parity layer (SURVEY §2.8): the flag surface of both reference
  * binaries (`osm-lump-ways` cli_args.rs:21-254, `osm-lump-ways-down`
  * cli_args.rs), parsed into engine configs. Flags the surveyed reference
  * parses but never acts on are accepted and recorded (`inert`), with the
  * reference's own validation errors replicated.
  */
object Cli {

  /** `parse_int_human` (down/cli_args.rs:9-23): 5k / 2m suffixes. */
  def parseIntHuman(s: String): Either[String, Long] = {
    val lower = s.toLowerCase
    def num(x: String) = scala.util.Try(x.toLong).toOption
    num(lower)
      .orElse(if (lower.endsWith("k")) num(lower.dropRight(1)).map(_ * 1000L) else None)
      .orElse(if (lower.endsWith("m")) num(lower.dropRight(1)).map(_ * 1000000L) else None)
      .toRight(s"""Unable to parse "$s"""")
  }

  final case class LumpArgs(
      inputFilename: String = "",
      outputFilename: String = "",
      overwrite: Boolean = false,
      config: LumpWays.Config = LumpWays.Config(),
      outputFrames: Option[String] = None,
      framesGroupMinLengthM: Option[Double] = None,
      betweenness: Boolean = false,
      betweennessMaxNodes: Long = 2000,
      saveAsLinestrings: Boolean = false,
      inclWayIds: Boolean = false,
      onlyTheseWayGroupsNodeid: Seq[Long] = Nil,
      inert: Map[String, String] = Map.empty)

  private val lumpInertFlags = Set(
    // parsed but no-op / asserted in the surveyed version (SURVEY §2.8)
    "--only-these-way-groups", "--only-these-way-groups-divmod",
    "--split-files-by-group", "--incl-dist-to-longer",
    "--max-sinuosity", "--only-longest-n-per-group",
    "--min-dist-to-longer-m", "--split-into-single-paths-by")

  def parseLump(argv: Seq[String]): Either[String, LumpArgs] = {
    var a = LumpArgs()
    var i = 0
    val filters = scala.collection.mutable.ArrayBuffer.empty[TagFilter]
    val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    def next(): String =
      if (i + 1 < argv.length) { i += 1; argv(i) }
      else throw new IllegalArgumentException(s"missing value for ${argv(i)}")
    try {
      while (i < argv.length) {
        argv(i) match {
          case "-i" | "--input-filename" =>
            a = a.copy(inputFilename = next())
          case "-o" | "--output-filename" =>
            a = a.copy(outputFilename = next())
          case "--overwrite" => a = a.copy(overwrite = true)
          case "-f" | "--tag-filter" =>
            TagFilter.parse(next()).fold(e => return Left(e), filters += _)
          case "-F" | "--tag-filter-func" =>
            TagFilterFunc.parse(next()).fold(e => return Left(e),
              f => a = a.copy(config = a.config.copy(tagFilterFunc = Some(f))))
          case "-g" | "--tag-group-k" =>
            groups += next().split(',').toSeq
          case "--incl-unset-group" =>
            a = a.copy(config = a.config.copy(inclUnsetGroup = true))
          case "--min-length-m" =>
            LumpWays.MinLengthFilter.parse(next()).fold(e => return Left(e),
              m => a = a.copy(config = a.config.copy(minLength = Some(m))))
          case "--max-length-m" =>
            a = a.copy(config = a.config.copy(maxLengthM = Some(next().toDouble)))
          case "--only-longest-n-per-file" =>
            parseIntHuman(next()).fold(e => return Left(e),
              n => a = a.copy(config = a.config.copy(topN = Some(n.toInt))))
          case "--output-frames" =>
            a = a.copy(outputFrames = Some(next()))
          case "--frames-group-min-length-m" =>
            a = a.copy(framesGroupMinLengthM = Some(next().toDouble))
          case "--betweenness" => a = a.copy(betweenness = true)
          case "--betweenness-max-nodes" =>
            parseIntHuman(next()).fold(e => return Left(e),
              n => a = a.copy(betweennessMaxNodes = n))
          case "--save-as-linestrings" => a = a.copy(saveAsLinestrings = true)
          case "--incl-wayids" => a = a.copy(inclWayIds = true)
          case "--only-these-way-groups-nodeid" =>
            a = a.copy(
              onlyTheseWayGroupsNodeid = a.onlyTheseWayGroupsNodeid :+ next().toLong)
          case flag if lumpInertFlags.contains(flag) =>
            // reference parses these; some it asserts empty (main.rs:520-521,
            // :706, :735) — record and (like the reference) reject use
            val value = if (i + 1 < argv.length && !argv(i + 1).startsWith("--"))
              { i += 1; argv(i) } else "true"
            flag match {
              case "--only-these-way-groups" | "--split-files-by-group" |
                  "--incl-dist-to-longer" =>
                return Left(s"$flag is not supported in this version")
              case _ => a = a.copy(inert = a.inert + (flag -> value))
            }
          case other => return Left(s"unknown flag: $other")
        }
        i += 1
      }
      if (a.config.tagFilterFunc.nonEmpty && filters.nonEmpty)
        return Left("cannot use both -f and -F") // clap conflicts_with
      Right(a.copy(config = a.config.copy(
        tagFilters = filters.toSeq, groupKeys = groups.toSeq)))
    } catch {
      case e: Exception => Left(e.getMessage)
    }
  }

  /** Output format from extension (main.rs:157-164). */
  sealed trait OutFormat
  case object GeoJson extends OutFormat
  case object GeoJsonSeq extends OutFormat
  case object Csv extends OutFormat
  def formatOf(filename: String): Either[String, OutFormat] =
    if (filename.endsWith(".geojsons")) Right(GeoJsonSeq)
    else if (filename.endsWith(".geojson")) Right(GeoJson)
    else if (filename.endsWith(".csv")) Right(Csv)
    else Left(s"cannot detect output format from filename: $filename")
}
