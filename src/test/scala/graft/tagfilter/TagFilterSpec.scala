package graft.tagfilter

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import TagFilter._

/** Ports the reference's tag-filter unit tables 1:1
  * (/root/reference/src/tagfilter.rs:383-767) and additionally runs every
  * eval case through the Catalyst compiler on a one-row DataFrame, so the
  * in-memory evaluator and the compiled Column are pinned to agree.
  */
class TagFilterSpec extends AnyFunSuite with SparkTestBase {

  private def re(p: String) = new scala.util.matching.Regex(p)

  // ---- parse table (tagfilter.rs:392-497) ----
  val parseCases: Seq[(String, TagFilter)] = Seq(
    "name" -> HasK("name"),
    " name" -> HasK("name"),
    " name  \t" -> HasK("name"),
    "∃name" -> HasK("name"),
    "highway=motorway" -> KV("highway", "motorway"),
    "highway≠motorway" -> KneV("highway", "motorway"),
    "highway=motorway,primary" -> KinV("highway", Seq("motorway", "primary")),
    "~name:.*" -> HasReK(re("name:.*")),
    "∃~name:.*" -> HasReK(re("name:.*")),
    "∃~^name(:.+)?" -> HasReK(re("^name(:.+)?")),
    "∄~name:.*" -> NotHasReK(re("name:.*")),
    "∃highway∉motorway,motorway_link" ->
      HasKnotInV("highway", Seq("motorway", "motorway_link")),
    "∃(lrb)a" -> HasKLeftRightBoth("a"),
    "∄(lrb)b" -> NotHasKLeftRightBoth("b"),
    "w123" -> OSMObj(incl = true, 'w', 123),
    "r123" -> OSMObj(incl = true, 'r', 123),
    "!w3" -> OSMObj(incl = false, 'w', 3),
    "¬w3" -> OSMObj(incl = false, 'w', 3),
    "highway∈motorway,primary" -> KinV("highway", Seq("motorway", "primary")),
    "highway≠motorway,primary" -> KnotInV("highway", Seq("motorway", "primary")),
    "highway∉motorway,primary" -> KnotInV("highway", Seq("motorway", "primary")),
    "highway~motorway" -> KreV("highway", re("motorway")),
    "∄name" -> NotHasK("name"),
    "name∨highway" -> Or(Seq(HasK("name"), HasK("highway"))),
    "name∧highway" -> And(Seq(HasK("name"), HasK("highway"))))

  for (((in, expected), i) <- parseCases.zipWithIndex)
    test(s"parse[$i]: $in") { assert(TagFilter.unsafeParse(in) == expected) }

  test("parse: empty is an error") { assert(TagFilter.parse("").isLeft) }

  // ---- eval table (tagfilter.rs:499-597) ----
  val evalCases: Seq[(String, Seq[(String, String)], Boolean)] = Seq(
    ("highway", Seq("highway" -> "primary"), true),
    ("highway∈primary,seconary", Seq("highway" -> "primary"), true),
    ("∃highway∉primary,seconary", Seq("highway" -> "primary"), false),
    ("∃highway∉primary,seconary", Seq("amenity" -> "bar"), false),
    ("highway∉primary,seconary", Seq("amenity" -> "bar"), true),
    ("∃highway∉primary,seconary", Seq("highway" -> "motorway"), true),
    ("∃(lrb)sidewalk", Nil, false),
    ("∃(lrb)sidewalk", Seq("sidewalk" -> "yes"), true),
    ("∃(lrb)sidewalk", Seq("sidewalk:both" -> "yes"), true),
    ("∃(lrb)sidewalk", Seq("sidewalk:left" -> "yes"), false),
    ("∃(lrb)sidewalk", Seq("sidewalk:left" -> "yes", "sidewalk:right" -> "yes"), true),
    ("∄(lrb)sidewalk", Nil, true),
    ("∄(lrb)sidewalk", Seq("sidewalk" -> "yes"), false),
    ("∄(lrb)sidewalk", Seq("sidewalk:both" -> "yes"), false),
    ("∄(lrb)sidewalk", Seq("sidewalk:left" -> "yes"), true),
    ("∄(lrb)sidewalk", Seq("sidewalk:left" -> "yes", "sidewalk:right" -> "yes"), false),
    // extra coverage: KV / KneV / regex / Or / And
    ("highway=primary", Seq("highway" -> "primary"), true),
    ("highway=primary", Seq("highway" -> "secondary"), false),
    ("highway≠primary", Seq("highway" -> "secondary"), true),
    ("highway≠primary", Nil, true),
    ("highway~mot", Seq("highway" -> "motorway"), true),
    ("highway~^ot", Seq("highway" -> "motorway"), false),
    ("~side", Seq("sidewalk:left" -> "yes"), true),
    ("name∨highway", Seq("highway" -> "x"), true),
    ("name∧highway", Seq("highway" -> "x"), false))

  /** Evaluate a compiled filter over a one-row DataFrame. */
  private def evalCompiled(f: TagFilter, tags: Seq[(String, String)]): Boolean = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tags",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))))
    val row = org.apache.spark.sql.Row(tags.toMap)
    val df = spark.createDataFrame(Seq(row).asJava, schema)
    df.select(TagFilterCompiler.compile(f, col("tags")).as("r"))
      .head().getBoolean(0)
  }

  for (((fs, tags, expected), i) <- evalCases.zipWithIndex) {
    test(s"eval[$i]: $fs ${tags.mkString(",")}") {
      val f = TagFilter.unsafeParse(fs)
      assert(f.eval(tags.toMap) == expected, "in-memory eval")
    }
    test(s"compiled[$i]: $fs ${tags.mkString(",")}") {
      val f = TagFilter.unsafeParse(fs)
      assert(evalCompiled(f, tags) == expected, "Catalyst-compiled eval")
    }
  }

  // ---- object-id filters (tagfilter.rs:746-766) ----
  val idCases = Seq(
    ("w1", 'w', 1L, true), ("w1", 'w', 2L, false), ("w1", 'r', 1L, false),
    ("!w1", 'w', 1L, false), ("!w1", 'w', 2L, true),
    ("¬w1", 'w', 1L, false), ("¬w1", 'w', 2L, true))
  for (((fs, t, id, expected), i) <- idCases.zipWithIndex)
    test(s"idFilter[$i]: $fs $t$id") {
      assert(TagFilter.unsafeParse(fs).eval(Map.empty, t, id) == expected)
    }

  // ---- filter-func element (tagfilter.rs:599-673) ----
  test("func element parse") {
    assert(TagFilterFuncElem.parse("T") == Right(TagFilterFuncElem.AlwaysTrue))
    assert(TagFilterFuncElem.parse("F") == Right(TagFilterFuncElem.AlwaysFalse))
    assert(TagFilterFuncElem.parse("highway→T") ==
      Right(TagFilterFuncElem.ThenTrue(HasK("highway"))))
    assert(TagFilterFuncElem.parse("waterway→F") ==
      Right(TagFilterFuncElem.ThenFalse(HasK("waterway"))))
    assert(TagFilterFuncElem.parse("waterway=canal∧lock=yes→F") ==
      Right(TagFilterFuncElem.ThenFalse(And(Seq(
        KV("waterway", "canal"), KV("lock", "yes"))))))
    assert(TagFilterFuncElem.parse("highway").isLeft)
    assert(TagFilterFuncElem.parse("highway=primary").isLeft)
  }

  val funcElemCases = Seq(
    ("T", Seq("highway" -> "yes"), Some(true)),
    ("F", Seq("highway" -> "yes"), Some(false)),
    ("highway→T", Seq("highway" -> "yes"), Some(true)),
    ("highway→T", Seq("natural" -> "water"), None),
    ("natural=water→T", Seq("natural" -> "water"), Some(true)),
    ("natural=water→T", Seq("natural" -> "rock"), None))
  for (((fs, tags, expected), i) <- funcElemCases.zipWithIndex)
    test(s"funcElem[$i]: $fs") {
      assert(TagFilterFuncElem.parse(fs).toOption.get.result(tags.toMap) == expected)
    }

  // ---- filter-func chains (tagfilter.rs:675-744) ----
  val funcCases = Seq(
    ("T", Seq("highway" -> "yes"), Some(true)),
    ("highway→T;F", Seq("highway" -> "yes"), Some(true)),
    ("highway→T;F", Seq("natural" -> "yes"), Some(false)),
    ("waterway=canal→F;waterway→T;F", Seq("waterway" -> "river"), Some(true)),
    ("waterway=canal→F;waterway→T;F", Seq("highway" -> "primary"), Some(false)),
    ("waterway=canal→F;waterway→T;F", Seq("waterway" -> "canal"), Some(false)),
    ("# This is a test comment\nwaterway=canal→F;waterway→T;F",
      Seq("waterway" -> "canal"), Some(false)),
    ("waterway=put_in\\u{3B}egress→F;waterway→T;F",
      Seq("waterway" -> "canal"), Some(true)))
  for (((fs, tags, expected), i) <- funcCases.zipWithIndex) {
    test(s"func[$i]") {
      assert(TagFilterFunc.unsafeParse(fs).result(tags.toMap) == expected)
    }
    test(s"funcCompiled[$i]") {
      import scala.jdk.CollectionConverters._
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tags",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))))
      val df = spark.createDataFrame(
        Seq(org.apache.spark.sql.Row(tags.toMap)).asJava, schema)
      val got = df.select(TagFilterCompiler
        .compileFunc(TagFilterFunc.unsafeParse(fs), col("tags")).as("r"))
        .head()
      val res = if (got.isNullAt(0)) None else Some(got.getBoolean(0))
      assert(res == expected)
    }
  }

  test("func chain ends without T/F can be undecided (reference panics)") {
    assert(TagFilterFunc.unsafeParse("highway→T").result(Map("x" -> "y")).isEmpty)
  }
}
