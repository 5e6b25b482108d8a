package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.text.TextOps

/** The native token-stats / lang-guess / fingerprint expressions must be
  * bit-equal to the HOF formulations the q27–q30 oracles replay —
  * including multi-byte unicode tokens (length() counts code points,
  * ascii() returns the code point), marker ties, and empty texts.
  */
class TextStatExprsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val texts = Seq(
    "", " ", "   ", "one", "the quick brown fox and the lazy dog",
    "der die das und ein stein", "le la les et un", "el los las y una",
    "the und le el", // marker tie across languages → first sorted lang wins
    "the the the und und le", // en wins on count
    "  double  spaces   everywhere  ", "ünïcødé tökens журавль здесь 🦊",
    "mixed the ünïcødé und text", "a b c d e f g h i j",
    "x" * 200, ("w " * 50).trim)
  private def df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("id", "text")

  test("tokenCount and quality columns ≡ HOF forms") {
    val hofQ = TextOps.qualityColumnsHof(col("text"))
    val natQ = TextOps.qualityColumns(col("text"))
    val cols = col("id") +:
      (TextOps.tokenCount(col("text")).as("tc_n") +:
        TextOps.tokenCountHof(col("text")).as("tc_h") +:
        (natQ.map { case (n, c) => c.as(s"n_$n") } ++
          hofQ.map { case (n, c) => c.as(s"h_$n") }))
    df.select(cols: _*).collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"tokenCount id=${r.getLong(0)}")
      natQ.indices.foreach { i =>
        assert(r.getLong(3 + i) == r.getLong(3 + natQ.length + i),
          s"quality[${natQ(i)._1}] id=${r.getLong(0)}")
      }
    }
  }

  test("langGuess ≡ HOF argmax (ties, unicode, no-hit → und)") {
    df.select(col("id"), col("text"),
        TextOps.langGuess(col("text")).as("native"),
        TextOps.langGuessHof(col("text")).as("hof"))
      .collect()
      .foreach(r => assert(r.getString(2) == r.getString(3),
        s"langGuess id=${r.getLong(0)} text='${r.getString(1)}'"))
  }

  test("fingerprint ≡ nested HOF fold (unicode code points included)") {
    df.select(col("id"),
        TextOps.fingerprint(col("text")).as("native"),
        TextOps.fingerprintHof(col("text")).as("hof"))
      .collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"fingerprint id=${r.getLong(0)}"))
  }
}
