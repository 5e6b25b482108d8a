package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins [[Pq.pqAdcTopK]] against an independent in-memory replication of
  * the whole pipeline (quantize → seed codebooks → Lloyd rounds with
  * empty-class carry → encode → LUT → ADC top-k), plus a recall check:
  * planted exact duplicates must surface as rank-1 neighbours at ADC
  * distance 0.
  */
class PqSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // deterministic "embeddings": 40 vectors, dim 16; ids ≡ 0 (mod 10)
  // are exact copies of id+1's vector (planted dups)
  private val dim = 16
  private def rawVec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i =>
      (((seed * 31 + i * 17 + 7) % 97).toFloat / 97f) - 0.5f)
  private val vecs: Seq[(Long, Array[Float])] =
    (0L until 40L).map(id =>
      (id, if (id % 10 == 0) rawVec(id + 1) else rawVec(id)))

  private val (m, ksub, iters, k, qmod) = (4, 4, 2, 3, 10L)
  private val d = dim / m

  /** Independent reference implementation (plain Scala collections).
    * Returns the top-k rows and the trained codebooks.
    */
  private def bruteFull: (Seq[(Long, Long, Long, Long)],
      Vector[Vector[Array[Long]]]) = {
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong + 1048576L)
    val qv = vecs.map { case (id, v) => (id, quant(v)) }
    val seeds = qv.sortBy(_._1).take(ksub).map(_._2)
    var cents: Vector[Vector[Array[Long]]] = Vector.tabulate(m)(b =>
      seeds.toVector.map(_.slice(b * d, b * d + d)))
    def l2(a: Array[Long], boff: Int, c: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < d) { val df = a(boff + i) - c(i); s += df * df; i += 1 }
      s
    }
    def assign(v: Array[Long]): Array[Int] =
      Array.tabulate(m) { b =>
        var best = -1; var bd = Long.MaxValue
        for (c <- 0 until ksub) {
          val dd = l2(v, b * d, cents(b)(c))
          if (dd < bd) { bd = dd; best = c }
        }
        best
      }
    for (_ <- 1 to iters) {
      val asg = qv.map { case (id, v) => (id, v, assign(v)) }
      cents = Vector.tabulate(m)(b => Vector.tabulate(ksub) { c =>
        val members = asg.collect { case (_, v, a) if a(b) == c => v }
        if (members.isEmpty) cents(b)(c)
        else Array.tabulate(d)(i =>
          members.map(_(b * d + i)).sum / members.size)
      })
    }
    val codes = qv.map { case (id, v) => (id, assign(v)) }
    val queries = qv.filter(_._1 % qmod == 0).sortBy(_._1)
    val rows = queries.flatMap { case (qid, q) =>
      val dists = codes.filter(_._1 != qid).map { case (nid, cs) =>
        (nid, (0 until m).map(b => l2(q, b * d, cents(b)(cs(b)))).sum)
      }
      dists.sortBy { case (nid, dd) => (dd, nid) }.take(k).zipWithIndex
        .map { case ((nid, dd), r) => (qid, r + 1L, nid, dd) }
    }
    (rows, cents)
  }

  test("pqAdcTopK == independent in-memory PQ replication") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = Pq.pqAdcTopK(df, "vec_id", "embedding", k,
      m = m, ksub = ksub, iters = iters, queryMod = qmod)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == bruteFull._1.sortBy(x => (x._1, x._2)))
  }

  test("planted exact duplicates achieve the LUT-minimum ADC distance") {
    // an exact copy's codes are, per block, the argmin of the query's
    // LUT — so the copy attains the SMALLEST possible ADC distance (the
    // query's own reconstruction residual) and the rank-1 distance must
    // equal Σ_b min_c lut(q, b, c). Not zero: ADC compares the raw query
    // against reconstructed codes (the asymmetric in ADC).
    val cents = bruteFull._2
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong + 1048576L)
    def minAdc(q: Array[Long]): Long =
      (0 until m).map { b =>
        (0 until ksub).map { c =>
          var s = 0L; var i = 0
          while (i < d) {
            val df = q(b * d + i) - cents(b)(c)(i); s += df * df; i += 1
          }
          s
        }.min
      }.sum
    val df = vecs.toDF("vec_id", "embedding")
    val got = Pq.pqAdcTopK(df, "vec_id", "embedding", k,
      m = m, ksub = ksub, iters = iters, queryMod = qmod)
      .filter(col("rank") === 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val vm = vecs.toMap
    for (q <- Seq(0L, 10L, 20L, 30L))
      assert(got(q)._2 == minAdc(quant(vm(q))), s"query $q: ${got(q)}")
    // for query 0 the copy (nid 1) is also the lowest possible tie-break
    assert(got(0L)._1 == 1L)
  }

  test("query gate trips loudly above maxQueries") {
    val df = vecs.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.pqAdcTopK(df, "vec_id", "embedding", k,
        m = m, ksub = ksub, iters = iters, queryMod = 1L, maxQueries = 5L)
    }
    assert(e.getMessage.contains("broadcast gate"))
  }
}
