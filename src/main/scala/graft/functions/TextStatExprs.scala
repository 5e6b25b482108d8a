package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics expressions for the training-data operators.
  *
  * The HOF formulations re-walk the token array in interpreted trees:
  * `langGuess` evaluates `filter(split(text))` plus a marker-membership
  * filter ~3× PER LANGUAGE per doc (the argmax fold references each
  * hit count twice), and `fingerprint` runs a per-character `aggregate`
  * fold inside a per-token `aggregate` fold — the single most
  * interpreted expression in the engine. Each expression here is one
  * pass over the text bytes; TextStatExprsSpec pins bit-equality with
  * the HOF forms (which the q27–q30 DuckDB oracles replay), including
  * multi-byte unicode tokens.
  */
object TextStatExprs {

  /** Characters (code points) in a UTF-8 byte range — `length(token)`
    * semantics (UTF8String.numChars): count non-continuation bytes.
    */
  private[functions] def numChars(bytes: Array[Byte], s: Int, e: Int): Int = {
    var n = 0
    var i = s
    while (i < e) {
      if ((bytes(i) & 0xC0) != 0x80) n += 1
      i += 1
    }
    n
  }

  /** (n_tokens, Σ length(token)) in one pass. */
  def tokenStats(str: UTF8String): InternalRow = {
    val bytes = str.getBytes
    val ranges = TextHashExprs.tokenRanges(bytes)
    var lenSum = 0L
    var i = 0
    while (i < ranges.length) {
      lenSum += numChars(bytes, ranges(i), ranges(i + 1))
      i += 2
    }
    new GenericInternalRow(Array[Any]((ranges.length / 2).toLong, lenSum))
  }

  /** Marker-hit argmax with first-wins tie-break over the given language
    * order — `TextOps.langGuess` semantics: hits(l) = #tokens that equal
    * any marker of l; best = first language (in order) with the strictly
    * largest hit count; 'und' when every count is 0.
    */
  def langGuess(
      str: UTF8String,
      langs: Array[UTF8String], markerBytes: Array[Array[Array[Byte]]]): UTF8String = {
    val bytes = str.getBytes
    val ranges = TextHashExprs.tokenRanges(bytes)
    val hits = new Array[Int](langs.length)
    var t = 0
    while (t < ranges.length) {
      val s = ranges(t); val e = ranges(t + 1); val len = e - s
      var l = 0
      while (l < langs.length) {
        val ms = markerBytes(l)
        var m = 0
        var hit = false
        while (!hit && m < ms.length) {
          val mb = ms(m)
          if (mb.length == len) {
            var k = 0
            while (k < len && bytes(s + k) == mb(k)) k += 1
            hit = k == len
          }
          m += 1
        }
        if (hit) hits(l) += 1
        l += 1
      }
      t += 2
    }
    var bestHits = 0
    var best: UTF8String = TextStatExprs.Und
    var l = 0
    while (l < langs.length) {
      if (hits(l) > bestHits) { bestHits = hits(l); best = langs(l) }
      l += 1
    }
    best
  }

  private val Und: UTF8String = UTF8String.fromString("und")

  /** `TextOps.fingerprint`: doc fold (acc*131 + tokenHash) % p over
    * tokens, where tokenHash is the char fold (acc*31 + codePoint) % p
    * from seed 7 — code-point iteration matches `split(tok, '')` +
    * `ascii()` (Java regex zero-width splits never split a surrogate
    * pair, and ascii() returns the code point of the 1-char string).
    */
  def rollingFingerprint(str: UTF8String, prime: Long): Long = {
    val bytes = str.getBytes
    val ranges = TextHashExprs.tokenRanges(bytes)
    var acc = 0L
    var t = 0
    while (t < ranges.length) {
      val tok = UTF8String.fromBytes(bytes, ranges(t), ranges(t + 1) - ranges(t))
        .toString
      var th = 7L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        th = (th * 31L + cp) % prime
        i += Character.charCount(cp)
      }
      acc = (acc * 131L + th) % prime
      t += 2
    }
    acc
  }
}

private[functions] trait StringInputExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }
}

/** struct(n_tokens, tok_len_sum) in one pass over the text. */
case class TokenStats(child: Expression) extends StringInputExpr {
  override def prettyName: String = "graft_token_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("tok_len_sum", LongType, nullable = false)))

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    TextStatExprs.tokenStats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextStatExprs.tokenStats($str);")
}

/** Stopword-hit language guess (argmax, first-wins over `langs` order). */
case class LangGuessExpr(
    child: Expression, langs: Seq[String], markerSets: Seq[Seq[String]])
    extends StringInputExpr {
  require(langs.length == markerSets.length && langs.nonEmpty)
  override def prettyName: String = "graft_lang_guess"
  override def dataType: DataType = StringType

  @transient private lazy val langsU: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray
  @transient private lazy val markerB: Array[Array[Array[Byte]]] =
    markerSets.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  override protected def withNewChildInternal(newChild: Expression): LangGuessExpr =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    TextStatExprs.langGuess(input.asInstanceOf[UTF8String], langsU, markerB)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("langs", langsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val mRef = ctx.addReferenceObj("markers", markerB, "byte[][][]")
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextStatExprs.langGuess($str, $lRef, $mRef);")
  }
}

/** Order-sensitive polynomial rolling-hash document fingerprint. */
case class RollingFingerprint(child: Expression, prime: Long)
    extends StringInputExpr {
  override def prettyName: String = "graft_fingerprint"
  override def dataType: DataType = LongType

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any =
    TextStatExprs.rollingFingerprint(input.asInstanceOf[UTF8String], prime)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextStatExprs.rollingFingerprint($str, ${prime}L);")
}
