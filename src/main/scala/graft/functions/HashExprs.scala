package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the dedup hash folds.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`array_min`)
  * are `CodegenFallback`: each is an interpreted tree walk that allocates
  * an intermediate array per row. The MinHash signature written with them
  * is 64 separate interpreted traversals of the shingle-hash array (and
  * SimHash is 63 interpreted vote folds) — measured as the dominant cost
  * of the signature stage at 500k docs (BENCH.md round 4). These
  * expressions compute the same values in ONE tight primitive-array pass
  * with whole-stage codegen (`doGenCode`), no per-row allocation beyond
  * the output.
  *
  * Semantics are bit-identical to the HOF forms (DedupSpec pins it):
  * the DuckDB oracles replaying MinHash/SimHash math stay valid.
  */
object HashExprs {
  /** pmod(x, MersennePrime) for the affine MinHash step — matches Spark's
    * `pmod` (((x % p) + p) % p) for every long input, including the
    * wrap-around case the staged bounds (a < 2^30, h < 2^32, b < 2^61)
    * never reach.
    */
  val MersennePrime: Long = (1L << 61) - 1
}

/** MinHash signature: for permutation j, min over the input hash array of
  * pmod(h * a(j) + b(j), 2^61-1). Returns array<long>[numHashes]; an
  * empty input yields an array of nulls (the `array_min(empty) = null`
  * behaviour of the HOF form it replaces); a null input is null.
  *
  * Equivalent HOF form (graft.dedup.Dedup.minhashSignatureFromHashes's
  * original shape, kept in DedupSpec as the equivalence oracle):
  *   array(j -> array_min(transform(hs, h -> pmod(h*a_j + b_j, P))))
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need matching hash params")

  // primitive copies for the hot loop / codegen reference objects
  // (Seq params keep case-class structural equality for Catalyst's
  // canonicalization; Array fields compare by reference)
  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    if (n == 0) {
      new GenericArrayData(Array.fill[Any](k)(null))
    } else {
      val out = Array.fill[Long](k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          var v = (h * aArr(j) + bArr(j)) % HashExprs.MersennePrime
          if (v < 0) v += HashExprs.MersennePrime
          if (v < out(j)) out(j) = v
          j += 1
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val k = as.length
    val p = HashExprs.MersennePrime
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val nulls = ctx.freshName("nulls")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  Object[] $nulls = new Object[$k];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($nulls);
         |} else {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $arr.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($v < 0) $v += ${p}L;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }
}

/** SimHash over a token-hash array: bit i of the result is 1 iff the sum
  * over hashes of ±1 (per hash bit i) is positive. One pass over the
  * array with a primitive vote accumulator; `bits` ≤ 63 keeps the result
  * a positive BIGINT. An empty input yields 0 (all votes 0, no positive
  * bit — the `aggregate(empty, 0) = 0` behaviour of the HOF form);
  * a null input is null (the HOF form collapsed null to 0 through
  * `when`'s null-as-false; no query feeds null token arrays — pinned in
  * DedupSpec).
  */
case class SimHash63(child: Expression, bits: Int = 63)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1,63]; got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def withNewChildInternal(newChild: Expression): SimHash63 =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sh |= (1L << j)
      j += 1
    }
    sh
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = bits
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sh = ctx.freshName("sh")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $votes = new int[$k];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $sh = 0L;
         |for (int $j = 0; $j < $k; $j++) {
         |  if ($votes[$j] > 0) $sh |= (1L << $j);
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })
  }
}
