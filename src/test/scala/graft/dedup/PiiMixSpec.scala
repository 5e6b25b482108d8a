package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.text.TextOps

/** Pins the PII-redaction and domain-mixing operators (q71/q72). */
class PiiMixSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def redact(s: String): (Long, Long, Long, String) = {
    val r = Seq(Tuple1(s)).toDF("text")
      .select(TextOps.piiRedact(col("text")).as("r"))
      .select(col("r.n_email"), col("r.n_ip"), col("r.n_phone"),
        col("r.clean"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("piiRedact: all three kinds, in-place tokens") {
    assert(redact("mail a.b+c@ex.com now 10.0.0.1 or 555-1234 end") ==
      ((1L, 1L, 1L, "mail <EMAIL> now <IP> or <PHONE> end")))
  }

  test("piiRedact: email wins over an IP-shaped local part") {
    // 1.2.3.4@q.co is one email; after <EMAIL> no dotted quad remains
    assert(redact("x 1.2.3.4@q.co y") == ((1L, 0L, 0L, "x <EMAIL> y")))
  }

  test("piiRedact: word boundaries reject embedded near-matches") {
    // 4-digit first octet and a 4-digit 555 prefix never match
    assert(redact("a 1234.5.6.7 b 5555-1234 c") ==
      ((0L, 0L, 0L, "a 1234.5.6.7 b 5555-1234 c")))
  }

  test("piiRedact: multiple hits counted per kind") {
    val (e, i, p, c) = redact("u@v.de w@x.org 10.1.1.1 555-0000 555-9999")
    assert((e, i, p) == ((2L, 1L, 2L)))
    assert(c == "<EMAIL> <EMAIL> <IP> <PHONE> <PHONE>")
  }

  test("domainMixWeights: exact sqrt ratios, ppm-of-max, allocation") {
    val docs = Seq(
      ("a", "t1 t2"), ("a", "t3 t4"),          // 4 tokens, 2 docs
      ("b", Seq.tabulate(16)(i => s"w$i").mkString(" ")), // 16 tokens
      ("c", "x y z w v u q r s"))              // 9 tokens
      .toDF("source", "text")
    val r = TextOps.domainMixWeights(docs, "source", "text", 100000L)
      .collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    // sqrt(4)/sqrt(16) = 0.5, sqrt(9)/sqrt(16) = 0.75 — exact doubles
    assert(r("a") == ((2L, 4L, 500000L, 50000L)))
    assert(r("b") == ((1L, 16L, 1000000L, 100000L)))
    assert(r("c") == ((1L, 9L, 750000L, 75000L)))
  }
}
