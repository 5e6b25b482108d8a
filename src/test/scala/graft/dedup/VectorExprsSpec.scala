package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The native cosine expression must be BIT-equal to the HOF fold it
  * replaced (the q50/q56/q63 oracles hash raw doubles): same sequential
  * accumulation, null poisoning on null elements or length mismatch, and
  * null on zero norms (Spark Divide's zero-divisor rule).
  */
class VectorExprsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def vec(d: Int): Seq[Float] =
    Seq.fill(d)((rnd.nextFloat() - 0.5f) * 4f)

  test("CosineSimF ≡ HOF cosine bit-for-bit on random float vectors") {
    val rows = (1L to 200L).map(i => (i, vec(64), vec(64)))
    val got = rows.toDF("id", "a", "b")
      .select(col("id"),
        Dedup.cosine(col("a"), col("b")).as("native"),
        Dedup.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"cosine bit drift id=${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }

  test("edge cases: length mismatch, zero vector, empty, null element → null (as HOF)") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))),
        |  (2, array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        |  (3, array(CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        |  (4, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), CAST(NULL AS ARRAY<FLOAT>)),
        |  (5, CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)),
        |  (6, array(CAST(3.0 AS FLOAT), CAST(-4.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(-4.0 AS FLOAT)))
        |  AS t(id, a, b)""".stripMargin)
    val got = df.select(col("id"),
        Dedup.cosine(col("a"), col("b")).as("native"),
        Dedup.cosineHof(col("a"), col("b")).as("hof"))
      .collect().map(r => (r.getInt(0),
        (if (r.isNullAt(1)) null else r.getDouble(1),
         if (r.isNullAt(2)) null else r.getDouble(2)))).toMap
    got.foreach { case (id, (n, h)) => assert(n == h, s"id=$id: $n vs $h") }
    assert(got(1)._1 == null && got(2)._1 == null && got(3)._1 == null &&
      got(4)._1 == null && got(5)._1 == null)
    assert(got(6)._1 == 1.0)
  }

  test("SignLshBucket ≡ HOF lshBucket (random, empty, null element, zero)") {
    val rows = (1L to 200L).map(i => (i, vec(64)))
    val got = rows.toDF("id", "v")
      .select(col("id"),
        Dedup.lshBucket(col("v"), 8).as("native"),
        Dedup.lshBucketHof(col("v"), 8).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"bucket drift id=${r.getLong(0)}"))
    assert(got.map(_.getLong(1)).distinct.length > 10) // buckets spread
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (1, CAST(array() AS ARRAY<FLOAT>)),
        |  (2, array(CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT))),
        |  (3, array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)))
        |  AS t(id, v)""".stripMargin)
      .select(col("id"),
        Dedup.lshBucket(col("v"), 8).as("native"),
        Dedup.lshBucketHof(col("v"), 8).as("hof"))
      .collect()
    edge.foreach(r => assert(r.getLong(1) == r.getLong(2) && r.getLong(1) == 0L))
  }

  test("double-typed arrays work too") {
    val rows = (1L to 20L).map(i =>
      (i, vec(16).map(_.toDouble), vec(16).map(_.toDouble)))
    rows.toDF("id", "a", "b")
      .select(Dedup.cosine(col("a"), col("b")).as("native"),
        Dedup.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
      .foreach(r => assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }
}
