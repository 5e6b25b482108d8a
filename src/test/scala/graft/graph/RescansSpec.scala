package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.tagfilter.TagFilter

/** S4 relation-tags-overwrite + S5 ends-membership re-scans. */
class RescansSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  test("S4: largest relation wins, ties -> highest rid; relation values override") {
    val ways = Seq(
      (1L, Seq(1L, 2L), Map("name" -> "wayname", "waterway" -> "river"), ts),
      (2L, Seq(2L, 3L), Map("waterway" -> "stream"), ts))
      .toDF("wid", "nids", "tags", "ts")
    val relations = Seq(
      // rel 10: 2 members incl way 1
      (10L, Seq(("way", 1L, "main_stream"), ("way", 9L, "main_stream")),
        Map("name" -> "BigRel")),
      // rel 11: 2 members incl way 1 — same size, higher id wins
      (11L, Seq(("way", 1L, "main_stream"), ("way", 8L, "main_stream")),
        Map("name" -> "HigherRel")),
      // rel 12: 1 member (way 2), wrong role
      (12L, Seq(("way", 2L, "side_stream")), Map("name" -> "Side")))
      .toDF("rid", "members0", "tags")
      .withColumn("members",
        expr("transform(members0, m -> struct(m._1 AS objtype, m._2 AS ref, m._3 AS role))"))
      .drop("members0")

    val out = Rescans.relationTagsOverwrite(ways, relations, Seq("main_stream"))
      .collect().map(r => (r.getLong(0), r.getMap[String, String](2).toMap)).toMap
    assert(out(1L) == Map("name" -> "HigherRel", "waterway" -> "river"))
    assert(out(2L) == Map("waterway" -> "stream")) // role filtered away
  }

  test("S5: OR-fold membership filters + reference's concat-dedup rule") {
    val ways = Seq(
      (1L, Seq(100L, 2L), Map("name" -> "a", "canal" -> "yes"), ts),
      (2L, Seq(100L, 3L), Map("name" -> "a"), ts),
      (3L, Seq(100L, 4L), Map("name" -> "b"), ts),
      (4L, Seq(100L, 5L), Map("name" -> "b"), ts), // "a;b" != "b" -> appended
      (5L, Seq(200L, 6L), Map.empty[String, String], ts))
      .toDF("wid", "nids", "tags", "ts")
    val ends = Seq(100L, 200L).toDF("nid")
    val out = Rescans.endsMembership(ends, ways,
      Seq(TagFilter.unsafeParse("canal=yes"), TagFilter.unsafeParse("highway")),
      Seq("name"))
      .collect().map(r => (r.getLong(0),
        (r.getAs[Boolean]("is_in_0"), r.getAs[Boolean]("is_in_1"),
          r.getAs[Long]("is_in_count"), r.getAs[String]("tag_name")))).toMap
    assert(out(100L) == ((true, false, 1L, "a;b;b")))
    assert(out(200L) == ((false, false, 0L, null)))
  }

  test("D8: ends GeoJSON feature bytes") {
    import graft.graph.DownOps
    val ends = Seq((100L, 1234.56), (200L, 0.4)).toDF("nid", "upstream_m")
    val nodes = Seq((100L, 10.5, -3.25), (200L, 0.0, 0.0)).toDF("nid", "lat", "lon")
    val membership = Seq((100L, true, 1L, "a;b")).toDF("nid", "is_in_0", "is_in_count", "tag_name")
    val feats = DownOps.endsGeoJson(ends, nodes, membership, Some(1.0),
        Seq(TagFilter.unsafeParse("canal=yes")), Seq("name"))
      .collect().map(_.getString(0))
    assert(feats.length == 1) // 0.4 gated by min-upstream
    val f = feats.head
    assert(f.contains(""""upstream_m":1234.6"""))
    assert(f.contains(""""nid":100"""))
    // reference Display key + numeric count (down/main.rs:1078-1082)
    assert(f.contains(""""is_in:canal=yes":true"""), f)
    assert(f.contains(""""is_in_count":1"""), f)
    assert(f.contains(""""tag:name":"a;b""""))
    assert(f.contains(""""coordinates":[-3.250000, 10.500000]"""))
    assert(f.endsWith(""""type":"Feature"}"""))
    // serde_json alphabetical key order
    val propsPart = f.stripPrefix("""{"properties":{""").takeWhile(_ != '}')
    val keys = """"([a-z_:=]+)":""".r.findAllMatchIn(propsPart).map(_.group(1)).toSeq
    assert(keys == keys.sorted, keys)
  }
}
