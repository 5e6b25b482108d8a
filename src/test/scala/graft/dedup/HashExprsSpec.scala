package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.SparkTestBase
import graft.functions.{GraftExtensions, MinHashSig, SimHash63}

/** The native MinHash/SimHash Catalyst expressions must be bit-equal to
  * the higher-order-function formulations they replaced (which the DuckDB
  * oracles replay in SQL), on randomized inputs, through BOTH the codegen
  * path (DataFrame run) and the interpreted `eval` path (direct call).
  */
class HashExprsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Seeded random hash arrays: in-bounds md5h32 values (< 2^32) plus
  // full-range longs to pin pmod wrap parity beyond the staged bounds.
  private val rnd = new scala.util.Random(42)
  private val rows: Seq[(Long, Seq[Long])] =
    (1L to 60L).map { id =>
      val n = rnd.nextInt(30) + 1
      val hs = Seq.fill(n) {
        if (rnd.nextBoolean()) rnd.nextLong(1L << 32) else rnd.nextLong()
      }
      (id, hs)
    } :+ (61L, Seq.empty[Long]) // empty array row

  private def df = rows.toDF("id", "hs")

  test("MinHashSig is bit-equal to the HOF formulation (incl. empty array)") {
    val got = df.select(
        col("id"),
        Dedup.minhashSignatureFromHashes(col("hs")).as("native"),
        Dedup.minhashSignatureFromHashesHof(col("hs")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"minhash mismatch for id=${r.getLong(0)}")
    }
    // empty array → 64 nulls, matching array_min(empty) = null
    val empty = got.find(_.getLong(0) == 61L).get.getSeq[Any](1)
    assert(empty.length == 64 && empty.forall(_ == null))
  }

  test("SimHash63 is bit-equal to the HOF formulation (incl. empty array)") {
    val got = df.select(
        col("id"),
        Dedup.simhashFromHashes(col("hs")).as("native"),
        Dedup.simhashFromHashesHof(col("hs")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"simhash mismatch for id=${r.getLong(0)}")
    }
    assert(got.find(_.getLong(0) == 61L).get.getLong(1) == 0L)
  }

  test("interpreted eval path matches the codegen path") {
    val (as, bs) = Dedup.hashParams(64).unzip
    val mh = MinHashSig(BoundReference(0, ArrayType(LongType), nullable = true), as, bs)
    val sh = SimHash63(BoundReference(0, ArrayType(LongType), nullable = true))
    val viaDf = df.select(
        col("id"),
        Dedup.minhashSignatureFromHashes(col("hs")).as("sig"),
        Dedup.simhashFromHashes(col("hs")).as("sh"))
      .collect().map(r => (r.getLong(0), (r.getSeq[Any](1), r.getLong(2)))).toMap
    rows.foreach { case (id, hs) =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        new GenericArrayData(hs.toArray))
      val evalSig = mh.eval(row).asInstanceOf[ArrayData]
      val sigSeq: Seq[Any] =
        (0 until evalSig.numElements()).map(i =>
          if (evalSig.isNullAt(i)) null else evalSig.getLong(i))
      assert(sigSeq == viaDf(id)._1, s"eval/codegen minhash drift id=$id")
      if (hs.nonEmpty || true) {
        val evalSh = sh.eval(row).asInstanceOf[Long]
        assert(evalSh == viaDf(id)._2, s"eval/codegen simhash drift id=$id")
      }
    }
    // null input → null (documented deviation from the HOF's null→0)
    val nullRow = org.apache.spark.sql.catalyst.InternalRow(null)
    assert(mh.eval(nullRow) == null && sh.eval(nullRow) == null)
  }

  test("GraftExtensions registers graft_minhash64/graft_simhash63 as SQL functions") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark) // a genuinely new session carrying the extension
      val r = s2.sql(
        """SELECT graft_minhash64(array(CAST(7 AS BIGINT), CAST(11 AS BIGINT))) AS sig,
          |       graft_simhash63(array(CAST(5 AS BIGINT), CAST(4 AS BIGINT), CAST(5 AS BIGINT))) AS sh
          |""".stripMargin).collect().head
      val (as, bs) = Dedup.hashParams(64).unzip
      val expectSig = MinHashSig(
        Literal(new GenericArrayData(Array(7L, 11L)), ArrayType(LongType)), as, bs)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      assert(r.getSeq[Long](0) == expectSig)
      // votes: bit0 of {5,4,5} = {1,0,1} → +1; bit2 = {1,1,1} → +3 → sh = 5
      assert(r.getLong(1) == 5L)
      // the text-hash functions resolve too, and match the Scala API
      val r2 = s2.sql(
        "SELECT graft_shingle_hashes('a b c d'), graft_token_hashes63('a b c d')")
        .collect().head
      val viaApi = Seq(("a b c d"))
        .toDF("t").select(
          Dedup.distinctShingleHashes(col("t")).as("sh"),
          Dedup.tokenHashes63(col("t")).as("th"))
        .collect().head
      assert(r2.getSeq[Long](0) == viaApi.getSeq[Long](0))
      assert(r2.getSeq[Long](1) == viaApi.getSeq[Long](1))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
