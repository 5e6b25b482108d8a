package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Σ haversine over a point chain, as one native pass.
  *
  * Replaces the D6 per-row HOF fold
  *   `aggregate(sequence(2, size(pts)), 0.0, (acc,i) => acc +
  *      haversineM(pt(i-1), pt(i)))`
  * which walks an interpreted tree of ~14 nodes (two `element_at` + the
  * trig formula) per chain point per edge. IEEE parity with the Column
  * form is load-bearing (length oracles compare rounded sums): each step
  * calls the SAME java.lang.Math functions in the SAME order as the
  * codegen'd column tree — `toRadians`, `pow(sin(x), 2.0)` (NOT sin·sin;
  * Math.pow is what Spark's `pow` compiles to), `asin(sqrt(a))` — and
  * accumulates left-to-right. GeoExprsSpec pins bit-equality.
  *
  * Input: array<struct<pos, lat: double, lon: double>> (field positions
  * 1 and 2 are read; field 0 is the sort key the caller ordered by).
  * Chains with < 2 points sum to 0.0 (the HOF guard's `otherwise(0.0)`).
  * A null element or null lat/lon poisons the sum → null (null
  * propagation through the fold). Null input → null.
  */
case class ChainHaversineM(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length >= 3 &&
        s(1).dataType == DoubleType && s(2).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<_, lat double, lon double>>, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_chain_haversine_m"

  @transient private lazy val nFields: Int = child.dataType match {
    case ArrayType(s: StructType, _) => s.length
    case _ => 3
  }

  override protected def withNewChildInternal(newChild: Expression): ChainHaversineM =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    ChainHaversineM.sum(input.asInstanceOf[ArrayData], nFields)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.ChainHaversineM.sum($arr, $nFields);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $boxed).doubleValue(); }
       """.stripMargin
    })
}

object ChainHaversineM {
  private val TwoR = 2.0 * graft.geo.Geo.EarthRadiusM

  /** boxed Double or null — shared by eval and codegen. */
  def sum(arr: ArrayData, nFields: Int): java.lang.Double = {
    val n = arr.numElements()
    if (n < 2) return java.lang.Double.valueOf(0.0)
    var acc = 0.0
    var prevLat = 0.0
    var prevLon = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val row = arr.getStruct(i, nFields)
      if (row.isNullAt(1) || row.isNullAt(2)) return null
      val lat = row.getDouble(1)
      val lon = row.getDouble(2)
      if (i > 0) {
        // the Column tree's exact op order (Geo.haversineM)
        val dLat = Math.toRadians(lat - prevLat) / 2.0
        val dLon = Math.toRadians(lon - prevLon) / 2.0
        val a = Math.pow(Math.sin(dLat), 2.0) +
          Math.cos(Math.toRadians(prevLat)) * Math.cos(Math.toRadians(lat)) *
            Math.pow(Math.sin(dLon), 2.0)
        acc = acc + TwoR * Math.asin(Math.sqrt(a))
      }
      prevLat = lat
      prevLon = lon
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
