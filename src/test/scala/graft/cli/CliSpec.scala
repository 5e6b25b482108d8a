package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.LumpWays.MinLengthFilter
import graft.tagfilter.TagFilter

class CliSpec extends AnyFunSuite {

  test("parse_int_human: 5k/2m suffixes (down/cli_args.rs:9-23)") {
    assert(Cli.parseIntHuman("5") == Right(5L))
    assert(Cli.parseIntHuman("5k") == Right(5000L))
    assert(Cli.parseIntHuman("2M") == Right(2000000L))
    assert(Cli.parseIntHuman("x").isLeft)
  }

  test("full flag line parses into the pipeline config") {
    val Right(a) = Cli.parseLump(Seq(
      "-i", "/in", "-o", "out.geojsons", "--overwrite",
      "-f", "waterway=river", "-f", "∄tunnel",
      "-g", "name,name:en",
      "--min-length-m", "50km",
      "--only-longest-n-per-file", "5k",
      "--betweenness-output", "b.geojsons", "--betweenness-max-nodes", "100",
      "--betweenness-min-value", "2", "--betweenness-min-fraction", "0.1"))
    assert(a.inputFilename == "/in" && a.outputFilename == "out.geojsons")
    assert(a.overwrite && a.betweennessOutput.contains("b.geojsons"))
    assert(a.betweennessMaxNodes == 100 && a.betweennessMinValue == 2.0)
    assert(a.betweennessMinFraction == 0.1)
    assert(a.config.tagFilters == Seq(
      TagFilter.KV("waterway", "river"), TagFilter.NotHasK("tunnel")))
    assert(a.config.groupKeys == Seq(Seq("name", "name:en")))
    assert(a.config.minLength.contains(MinLengthFilter.Length(50000.0)))
    assert(a.config.topN.contains(5000))
  }

  test("inert flags recorded; asserted-away flags rejected (SURVEY §2.8)") {
    val Right(a) = Cli.parseLump(Seq("--max-sinuosity", "1.5"))
    assert(a.inert == Map("--max-sinuosity" -> "1.5"))
    assert(Cli.parseLump(Seq("--split-files-by-group")).isLeft)
    assert(Cli.parseLump(Seq("--only-these-way-groups", "w1")).isLeft)
  }

  test("errors: unknown flag, missing value, -f/-F conflict, bad filter") {
    assert(Cli.parseLump(Seq("--bogus")).isLeft)
    assert(Cli.parseLump(Seq("-f")).isLeft)
    assert(Cli.parseLump(Seq("-f", "x", "-F", "T")).isLeft)
    assert(Cli.parseLump(Seq("-f", "")).isLeft)
  }

  test("output format from extension (main.rs:157-164)") {
    assert(Cli.formatOf("a.geojson") == Right(Cli.GeoJson))
    assert(Cli.formatOf("a.geojsons") == Right(Cli.GeoJsonSeq))
    assert(Cli.formatOf("a.csv") == Right(Cli.Csv))
    assert(Cli.formatOf("a.txt").isLeft)
  }
}
