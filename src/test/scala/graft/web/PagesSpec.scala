package graft.web

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Graft pages table: deterministic synthesis, geocode extraction,
  * null-geocode path, and the text byte-identity invariant
  * (input_hint: byte-identical extracted text per url).
  */
class PagesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("synthesis is deterministic and has the input_hint schema") {
    val a = Pages.synthesizeFromDocuments(spark, dir)
    val b = Pages.synthesizeFromDocuments(spark, dir)
    assert(a.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "url" -> "string", "warc_ts" -> "timestamp",
      "html" -> "binary", "text" -> "string", "lang" -> "string"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("geocode: 1 in 10 pages has no coordinates; values are exact") {
    val g = Pages.geocode(Pages.synthesizeFromDocuments(spark, dir))
    val n = g.count()
    val nNull = g.filter(col("plat").isNull).count()
    assert(nNull == n / 10)
    val one = g.filter(col("url") === "doc://1")
      .select("plat", "plon").head()
    assert(one.getDouble(0) == ((1L * 7919123) % 1700000 - 850000) / 10000.0)
    assert(one.getDouble(1) == ((1L * 104729177) % 3600000 - 1800000) / 10000.0)
  }

  test("text survives synthesis + geocode byte-identical (md5 per url)") {
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select(concat(lit("doc://"), col("doc_id").cast("string")).as("url"),
        md5(col("text")).as("want"))
    val got = Pages.textChecksums(
      Pages.geocode(Pages.synthesizeFromDocuments(spark, dir)))
    val joined = src.join(got, Seq("url"))
    assert(joined.count() == src.count())
    assert(joined.filter(col("want") =!= col("text_md5")).isEmpty)
  }

  test("nearestWayNode joins every geocoded page to exactly one node") {
    val nodes = Seq((100L, 0.0, 0.0), (101L, 45.0, 90.0), (102L, -45.0, -90.0))
      .toDF("nid", "lat", "lon")
    val r = Pages.nearestWayNode(
      Pages.synthesizeFromDocuments(spark, dir), nodes, 4)
    val n = Pages.geocode(Pages.synthesizeFromDocuments(spark, dir))
      .filter(col("plat").isNotNull).count()
    assert(r.count() == n)
    assert(r.groupBy("url").count().filter(col("count") > 1).isEmpty)
    assert(r.filter(col("text").isNull).isEmpty) // text carried through
  }
}
