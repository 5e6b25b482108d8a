package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the IVF ANN operator (Dedup.ivfCosineTopK): cluster recall on
  * separable data, exactness of the reported similarities, determinism
  * under repartitioning, and self-exclusion. The Spark↔DuckDB parity of
  * the same pipeline is the q56 oracle's job.
  */
class IvfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dim = 16

  /** 4 well-separated clusters of 25 vectors each: cluster c lives on
    * axes [4c, 4c+4) with a small deterministic jitter, so every
    * vector's true nearest neighbours are its own cluster.
    */
  private def clustered = {
    val rows = for {
      c <- 0 until 4
      j <- 0 until 25
    } yield {
      val id = (c * 25 + j).toLong
      val v = Array.tabulate(dim) { i =>
        val base = if (i / 4 == c) 1.0f else 0.0f
        base + ((id * 31 + i * 7) % 13).toFloat / 130.0f
      }
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** 12 mutually near-orthogonal vectors (distinct one-hot axis + a tiny
    * id-keyed secondary component): every distinct pair has cosine ≈ 0,
    * so a planted perturbed copy is the only thing near τ.
    */
  private def orthogonal = {
    val rows = (0 until 12).map { id =>
      val v = Array.tabulate(dim)(i => if (i == id) 1.0f else 0.0f)
      v((id + 5) % dim) = 0.01f * (id + 1)
      (id.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("embedNearDupPairs: recovers planted dups once each, nothing else") {
    // plant a perturbed copy of every vector at id+1000: cosine to its
    // original ≈ 1, while every cross pair is near-orthogonal (≈ 0)
    val base = orthogonal
    val planted = base.select((col("vec_id") + lit(1000L)).as("vec_id"),
      expr("transform(embedding, x -> x + CAST(0.001 AS FLOAT))").as("embedding"))
    val pairs = Dedup.embedNearDupPairs(
      base.unionByName(planted), "vec_id", "embedding", tauE6 = 990000L)
      .as[(Long, Long, Long)].collect()
    // one row per unordered pair, always id_a < id_b
    assert(pairs.forall { case (a, b, _) => a < b })
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    // every planted pair is found with sim ≥ τ (the tiny uniform shift
    // stays within the Hamming-1 probes on this fixture)…
    val plantedPairs = pairs.filter { case (a, b, _) => b == a + 1000L }
    assert(plantedPairs.length == 12,
      s"expected all 12 planted pairs, got ${plantedPairs.length}")
    assert(plantedPairs.forall(_._3 >= 990000L))
    // …and nothing else clears τ = 0.99
    assert(pairs.length == 12, s"non-planted pairs above τ: " +
      pairs.filterNot { case (a, b, _) => b == a + 1000L }.take(5).mkString(","))
  }

  test("embedNearDupPairs: threshold bites on the same candidate pair") {
    // two vectors that certainly share a bucket (differ only in a small
    // secondary weight): cosine ≈ 0.9998 — found at τ = 0.99, excluded
    // at τ = 0.999999
    val two = Seq(
      (1L, Seq(1.0f, 0.10f) ++ Seq.fill(dim - 2)(0.0f)),
      (2L, Seq(1.0f, 0.08f) ++ Seq.fill(dim - 2)(0.0f)))
      .toDF("vec_id", "embedding")
    val loose = Dedup.embedNearDupPairs(two, "vec_id", "embedding",
      tauE6 = 990000L).as[(Long, Long, Long)].collect()
    assert(loose.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(loose.head._3 < 1000000L)
    val tight = Dedup.embedNearDupPairs(two, "vec_id", "embedding",
      tauE6 = 999999L).as[(Long, Long, Long)].collect()
    assert(tight.isEmpty, s"unexpected pairs: ${tight.mkString(",")}")
  }

  test("ivf: high recall vs brute force on separable clusters") {
    val ivf = Dedup.ivfCosineTopK(clustered, "vec_id", "embedding", 3,
      nlist = 4, nprobe = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = Dedup.bruteForceCosineTopK(clustered, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(exact.size == 300)
    assert(recall >= 0.9, s"recall $recall on separable clusters")
  }

  test("ivf: reported sims are the exact cosine, self excluded, ranks dense") {
    val r = Dedup.ivfCosineTopK(clustered, "vec_id", "embedding", 3,
      nlist = 4, nprobe = 2).collect()
    val vecs = clustered.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    assert(r.nonEmpty)
    r.foreach { row =>
      val (qid, nid, sim, rank) =
        (row.getLong(0), row.getLong(1), row.getDouble(2), row.getInt(3))
      assert(qid != nid)
      assert(math.abs(sim - cos(vecs(qid), vecs(nid))) < 1e-9)
      assert(rank >= 1 && rank <= 3)
    }
    // ranks are dense 1..n per query and ordered by sim desc
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getDouble(2)).toSeq.reverse.sorted.reverse ==
        sorted.map(_.getDouble(2)).toSeq)
    }
  }

  test("ivf: identical results at any partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.ivfCosineTopK(df, "vec_id", "embedding", 3, nlist = 4, nprobe = 2)
        .select("qid", "rank", "nid", "sim")
        .as[(Long, Int, Long, Double)].collect().sortBy(x => (x._1, x._2)).toSeq
    val a = run(clustered.repartition(1))
    val b = run(clustered.repartition(17))
    assert(a == b)
  }

  test("ivf: empty input yields empty output with the right schema") {
    val empty = spark.emptyDataset[(Long, Seq[Float])]
      .toDF("vec_id", "embedding")
    val r = Dedup.ivfCosineTopK(empty, "vec_id", "embedding", 3)
    assert(r.columns.toSeq == Seq("qid", "nid", "sim", "rank"))
    assert(r.count() == 0)
  }
}
