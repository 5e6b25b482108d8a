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
      betweennessOutput: Option[String] = None,
      betweennessMinValue: Double = 1.0,   // cli_args.rs:227-233 default 1
      betweennessMinFraction: Double = 0.0,
      betweennessMaxNodes: Long = 2000,
      saveAsLinestrings: Boolean = false,
      inclWayIds: Boolean = false,
      onlyTheseWayGroupsNodeid: Seq[Long] = Nil,
      inert: Map[String, String] = Map.empty)

  private val lumpInertFlags = Set(
    // parsed but no-op / asserted in the surveyed version (SURVEY §2.8);
    // --csv-stats-file/--openmetrics are parsed by the reference's own
    // cli_args.rs:213-217 but never read in its main.rs — inert there too
    "--only-these-way-groups", "--only-these-way-groups-divmod",
    "--split-files-by-group", "--incl-dist-to-longer",
    "--max-sinuosity", "--only-longest-n-per-group",
    "--min-dist-to-longer-m", "--split-into-single-paths-by",
    "--csv-stats-file", "--openmetrics")

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
          case "--betweenness-output" => a = a.copy(betweennessOutput = Some(next()))
          case "--betweenness-min-value" =>
            a = a.copy(betweennessMinValue = next().toDouble)
          case "--betweenness-min-fraction" =>
            a = a.copy(betweennessMinFraction = next().toDouble)
          case "--betweenness-max-nodes" =>
            parseIntHuman(next()).fold(e => return Left(e),
              n => a = a.copy(betweennessMaxNodes = n))
          case "--save-as-linestrings" => a = a.copy(saveAsLinestrings = true)
          case "--incl-wayids" => a = a.copy(inclWayIds = true)
          case "--only-these-way-groups-nodeid" =>
            a = a.copy(
              onlyTheseWayGroupsNodeid = a.onlyTheseWayGroupsNodeid :+ next().toLong)
          case "--split-into-single-paths" =>
            a = a.copy(config = a.config.copy(splitIntoSinglePaths = true))
          case "--only-longest-n-splitted-paths" =>
            parseIntHuman(next()).fold(e => return Left(e),
              n => a = a.copy(config =
                a.config.copy(onlyLongestNSplittedPaths = Some(n.toInt))))
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

  /** `osm-lump-ways-down` flag surface (down/cli_args.rs:36-350). */
  final case class DownArgs(
      inputFilename: String = "",
      overwrite: Boolean = false,
      tagFilters: Seq[TagFilter] = Nil,
      tagFilterFunc: Option[TagFilterFunc] = None,
      minUpstreamM: Option[Double] = None,
      minLengthM: Option[Double] = None, // gates grouped-waterways features
      loops: Option[String] = None,
      loopsInclNids: Boolean = true, // default on unless --loops-no-incl-nids
      loopsCsvStatsFile: Option[String] = None,
      loopsOpenmetrics: Option[String] = None,
      ends: Option[String] = None,
      endsMembership: Seq[TagFilter] = Nil,
      endsTag: Seq[String] = Nil,
      endsCsvFile: Option[String] = None,
      endsCsvMinLengthM: Option[Double] = None,
      endsCsvOnlyLargestN: Option[Long] = None,
      endsCsvOnlyTagged: Boolean = false,
      upstreams: Option[String] = None,
      upstreamsMinUpstreamM: Option[Double] = None,
      upstreamsFromUpstreamMultiple: Seq[Double] = Nil,
      flowSplitEqually: Boolean = false,
      flowFollowsTag: Option[String] = None,
      groupedEnds: Option[String] = None,
      groupedEndsMaxDistanceM: Option[Double] = None,
      groupedWaterways: Option[String] = None,
      relationTagsOverwrite: Boolean = false,
      relationTagsRole: Seq[String] = Nil,
      longestSourceMouth: Option[String] = None,
      longestSourceMouthMinLengthM: Double = 0.0,
      longestSourceMouthLongestN: Option[Long] = None,
      longestSourceMouthUnnamedString: String = "unnnamed", // sic, cli_args.rs:343
      longestSourceMouthOnlyNamed: Boolean = false,
      inert: Map[String, String] = Map.empty)

  /** Flags the surveyed down binary parses but that have no effect on the
    * outputs this engine produces (or are unimplemented in the reference
    * itself, e.g. grouped_ends_max_upstream_delta is a todo!()).
    */
  private val downInertValueFlags = Set(
    "--output-frames", "--frames-group-min-length-m",
    "--min-dist-to-longer-m", "--max-sinuosity", "--only-longest-n-per-group",
    "--only-longest-n-per-file", "--only-longest-n-splitted-paths",
    "--split-into-single-paths-by", "--grouped-ends-max-upstream-delta",
    "--ends-upstreams-min-upstream-m", "--ends-upstreams-max-nodes")
  private val downInertBoolFlags = Set(
    "--split-files-by-group", "--split-into-single-paths",
    "--incl-dist-to-longer", "--incl-wayids", "--save-as-linestrings",
    "--upstream-output-ends-full", "--ends-upstreams", "--incl-unset-group")

  def parseDown(argv: Seq[String]): Either[String, DownArgs] = {
    var a = DownArgs()
    var i = 0
    val filters = scala.collection.mutable.ArrayBuffer.empty[TagFilter]
    def next(): String =
      if (i + 1 < argv.length) { i += 1; argv(i) }
      else throw new IllegalArgumentException(s"missing value for ${argv(i)}")
    try {
      while (i < argv.length) {
        argv(i) match {
          case "-i" | "--input-filename" => a = a.copy(inputFilename = next())
          case "--overwrite" => a = a.copy(overwrite = true)
          case "-f" | "--tag-filter" =>
            TagFilter.parse(next()).fold(e => return Left(e), filters += _)
          case "-F" | "--tag-filter-func" =>
            TagFilterFunc.parse(next()).fold(e => return Left(e),
              f => a = a.copy(tagFilterFunc = Some(f)))
          case "--min-upstream-m" => a = a.copy(minUpstreamM = Some(next().toDouble))
          case "--min-length-m" => a = a.copy(minLengthM = Some(next().toDouble))
          case "--loops" => a = a.copy(loops = Some(next()))
          case "--loops-incl-nids" => a = a.copy(loopsInclNids = true)
          case "--loops-no-incl-nids" => a = a.copy(loopsInclNids = false)
          case "--loops-csv-stats-file" => a = a.copy(loopsCsvStatsFile = Some(next()))
          case "--loops-openmetrics" => a = a.copy(loopsOpenmetrics = Some(next()))
          case "--ends" => a = a.copy(ends = Some(next()))
          case "--ends-membership" =>
            TagFilter.parse(next()).fold(e => return Left(e),
              f => a = a.copy(endsMembership = a.endsMembership :+ f))
          case "--ends-tag" => a = a.copy(endsTag = a.endsTag :+ next())
          case "--ends-csv-file" => a = a.copy(endsCsvFile = Some(next()))
          case "--ends-csv-min-length-m" =>
            a = a.copy(endsCsvMinLengthM = Some(next().toDouble))
          case "--ends-csv-only-largest-n" =>
            parseIntHuman(next()).fold(e => return Left(e),
              n => a = a.copy(endsCsvOnlyLargestN = Some(n)))
          case "--ends-csv-only-tagged" => a = a.copy(endsCsvOnlyTagged = true)
          case "--upstreams" => a = a.copy(upstreams = Some(next()))
          case "--upstreams-min-upstream-m" =>
            a = a.copy(upstreamsMinUpstreamM = Some(next().toDouble))
          case "--upstreams-from-upstream-multiple" =>
            a = a.copy(upstreamsFromUpstreamMultiple =
              a.upstreamsFromUpstreamMultiple :+ next().toDouble)
          case "--flow-split-equally" => a = a.copy(flowSplitEqually = true)
          case "--flow-follows-tag" => a = a.copy(flowFollowsTag = Some(next()))
          case "--grouped-ends" => a = a.copy(groupedEnds = Some(next()))
          case "--grouped-ends-max-distance-m" =>
            a = a.copy(groupedEndsMaxDistanceM = Some(next().toDouble))
          case "--grouped-waterways" => a = a.copy(groupedWaterways = Some(next()))
          case "--relation-tags-overwrite" => a = a.copy(relationTagsOverwrite = true)
          case "--relation-tags-role" =>
            a = a.copy(relationTagsRole = a.relationTagsRole :+ next())
          case "--longest-source-mouth" => a = a.copy(longestSourceMouth = Some(next()))
          case "--longest-source-mouth-min-length-m" =>
            a = a.copy(longestSourceMouthMinLengthM = next().toDouble)
          case "--longest-source-mouth-longest-n" =>
            parseIntHuman(next()).fold(e => return Left(e),
              n => a = a.copy(longestSourceMouthLongestN = Some(n)))
          case "--longest-source-mouth-unnamed-string" =>
            a = a.copy(longestSourceMouthUnnamedString = next())
          case "--longest-source-mouth-only-named" =>
            a = a.copy(longestSourceMouthOnlyNamed = true)
          case flag if downInertBoolFlags.contains(flag) =>
            a = a.copy(inert = a.inert + (flag -> "true"))
          case flag if downInertValueFlags.contains(flag) =>
            a = a.copy(inert = a.inert + (flag -> next()))
          case other => return Left(s"unknown flag: $other")
        }
        i += 1
      }
      if (a.tagFilterFunc.nonEmpty && filters.nonEmpty)
        return Left("cannot use both -f and -F") // clap conflicts_with
      val r = a.copy(tagFilters = filters.toSeq)
      // down/main.rs:199-227 validation
      if (r.ends.isEmpty && r.endsCsvFile.isEmpty && r.loops.isEmpty &&
          r.loopsCsvStatsFile.isEmpty && r.loopsOpenmetrics.isEmpty &&
          r.upstreams.isEmpty && r.groupedEnds.isEmpty &&
          r.groupedWaterways.isEmpty && r.longestSourceMouth.isEmpty)
        return Left(
          "Nothing to do. You need to specifiy one of --ends/--loops/--upstreams/etc.")
      if ((r.groupedEnds.nonEmpty || r.upstreams.nonEmpty || r.ends.nonEmpty ||
          r.endsCsvFile.nonEmpty) && !r.flowSplitEqually && r.flowFollowsTag.isEmpty)
        return Left("If you want to output upstreams or ends, you must " +
          "specificy one of --flow-split-equally or --flow-follows-tag TAG")
      if (r.flowSplitEqually && r.flowFollowsTag.nonEmpty)
        return Left("cannot use both --flow-split-equally and --flow-follows-tag")
      if (r.endsCsvFile.nonEmpty && r.endsTag.isEmpty)
        System.err.println("warn: The ends CSV file only makes sense with the " +
          "--ends-tag arguments. Since you have specified no end tags, " +
          "nothing will be written to the ends CSV file")
      Right(r)
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
