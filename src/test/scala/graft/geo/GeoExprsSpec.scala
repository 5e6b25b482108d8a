package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** ChainHaversineM must be BIT-equal to the D6 aggregate() fold it
  * replaced — length oracles compare rounded sums, so IEEE parity of
  * every step (toRadians, pow(sin,2), asin(sqrt)) and of the
  * accumulation order is load-bearing.
  */
class GeoExprsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hofChainLen(pts: org.apache.spark.sql.Column) = {
    def pt(i: org.apache.spark.sql.Column) = element_at(pts, i.cast("int"))
    when(size(pts) >= 2,
      aggregate(sequence(lit(2), size(pts)), lit(0.0),
        (acc, i) => acc + Geo.haversineM(
          pt(i - 1).getField("lat"), pt(i - 1).getField("lon"),
          pt(i).getField("lat"), pt(i).getField("lon"))))
      .otherwise(lit(0.0))
  }

  private def nativeChainLen(pts: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ChainHaversineM(
        org.apache.spark.sql.GraftColumnBridge.expression(pts)))

  test("ChainHaversineM ≡ aggregate fold bit-for-bit (random chains, 0/1-point chains)") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 120L).map { i =>
      val n = rnd.nextInt(12) // includes 0- and 1-point chains
      (i, (0 until n).map(p =>
        (p, rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180)))
    }
    val got = rows.toDF("id", "raw")
      .select(col("id"), transform(col("raw"), s => struct(
        s.getField("_1").as("pos"), s.getField("_2").as("lat"),
        s.getField("_3").as("lon"))).as("pts"))
      .select(col("id"),
        nativeChainLen(col("pts")).as("native"),
        hofChainLen(col("pts")).as("hof"),
        size(col("pts")).as("n"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"chain-length bit drift id=${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
      if (r.getInt(3) < 2) assert(r.getDouble(1) == 0.0)
    }
    assert(got.exists(_.getDouble(1) > 1000.0)) // the fixture is non-trivial
  }
}
