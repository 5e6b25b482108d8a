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
