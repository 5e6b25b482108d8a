package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Cosine similarity between two numeric vectors as one native pass.
  *
  * Replaces the HOF formulation
  *   `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_) / (sqrt(..)*sqrt(..))`
  * which evaluates three interpreted zip_with+aggregate walks PER PAIR —
  * the hot expression of the candidate-verify joins in `annCosineTopK`
  * and `embedNearDupPairs`, where candidate volume is (bits+1)·n/2^bits
  * pairs. Semantics are replicated exactly (VectorExprsSpec pins
  * bit-equality, and the q50/q56/q63 DuckDB oracles hash raw doubles):
  *
  *  - each dot product is a sequential left-to-right double accumulation
  *    of elementwise products (same IEEE result as the aggregate fold);
  *  - float elements are cast to double before multiplying;
  *  - a null element poisons the product (zip_with/aggregate null
  *    propagation) → result null;
  *  - length mismatch → null (zip_with pads the short side with null);
  *  - zero/empty norms → null (Spark's Divide returns null on a zero
  *    divisor in non-ANSI mode).
  */
/** Sign-LSH bucket id over `bits` deterministic hyperplanes — one pass
  * over the vector accumulating all `bits` dot products (the HOF form is
  * `bits` interpreted zip_with+aggregate walks per vector). Replicates
  * `Dedup.lshBucket` exactly: h(j,i) = ((j·2654435761 + i·40503) %
  * 1000003) / 1000003.0 · 2.0 − 1.0, bit j set iff the left-to-right
  * double fold of x_i·h(j,i) is > 0. A null element poisons every dot
  * (aggregate null propagation) so every `when` falls to 0 → bucket 0;
  * an empty vector likewise buckets to 0. Spec-pinned bit-equal.
  */
case class SignLshBucket(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 62, s"bits must be in [1,62]; got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_lsh_bucket"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    SignLshBucket.bucket(v, bits, isFloat)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SignLshBucket.bucket($v, $bits, $isFloat);")
}

object SignLshBucket {
  /** static worker shared by eval and codegen */
  def bucket(v: ArrayData, bits: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    val dots = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L // null poisons every dot → all bits 0
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var j = 0
      while (j < bits) {
        val m = (j * 2654435761L + i * 40503L) % 1000003L
        dots(j) += x * (m / 1000003.0 * 2.0 - 1.0)
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < bits) {
      if (dots(j) > 0.0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
}

case class CosineSimF(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> args, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimF =
    copy(left = newLeft, right = newRight)

  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  /** boxed-null result channel: nullSafeEval may return null */
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = av.numElements()
    if (bv.numElements() != n) return null
    var dotAb = 0.0; var dotAa = 0.0; var dotBb = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      val x = if (leftIsFloat) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (rightIsFloat) bv.getFloat(i).toDouble else bv.getDouble(i)
      dotAb += x * y
      dotAa += x * x
      dotBb += y * y
      i += 1
    }
    val denom = java.lang.Math.sqrt(dotAa) * java.lang.Math.sqrt(dotBb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dotAb / denom)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (leftIsFloat) "getFloat" else "getDouble"
    val lb = if (rightIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (av, bv) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dAb = ctx.freshName("dotAb")
      val dAa = ctx.freshName("dotAa")
      val dBb = ctx.freshName("dotBb")
      val den = ctx.freshName("denom")
      s"""
         |final int $n = $av.numElements();
         |if ($bv.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  double $dAb = 0.0, $dAa = 0.0, $dBb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($av.isNullAt($i) || $bv.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $av.$la($i);
         |    final double $y = (double) $bv.$lb($i);
         |    $dAb += $x * $y;
         |    $dAa += $x * $x;
         |    $dBb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $den = java.lang.Math.sqrt($dAa) * java.lang.Math.sqrt($dBb);
         |    if ($den == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dAb / $den; }
         |  }
         |}
       """.stripMargin
    })
  }
}

/** Integer-L2 k-means assignment: argmin over quantized centroids in ONE
  * codegen'd pass (exact Long arithmetic, ties → lowest index; length
  * mismatch or null element → -1 "unassignable"). Replaces the typed
  * mapPartitions closure that deserialized every row to Scala object
  * arrays — the encode/decode churn dominated the clustering stage of
  * `Dedup.semanticDedup` at scale (SemDedupAtScale: 113.8 s of 118.3 s)
  * and broke whole-stage codegen. The centroid matrix rides along as a
  * codegen reference object (O(k·dim), broadcast with the plan).
  */
case class QuantArgMin(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "QuantArgMin needs at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_quant_argmin"

  override protected def withNewChildInternal(newChild: Expression): QuantArgMin =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    QuantArgMin.assign(input.asInstanceOf[ArrayData], centroids)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QuantArgMin.assign($v, $ref);")
  }
}

object QuantArgMin {
  /** static worker shared by eval and codegen — zero allocation */
  def assign(v: ArrayData, cs: Array[Array[Long]]): Long = {
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return -1L; i += 1 }
    var best = -1L
    var bestD = Long.MaxValue
    var j = 0
    while (j < cs.length) {
      val c = cs(j)
      if (c.length == n) {
        var d = 0L
        var k = 0
        while (k < n) { val df = v.getLong(k) - c(k); d += df * df; k += 1 }
        if (d < bestD) { bestD = d; best = j }
      }
      j += 1
    }
    best
  }
}
