package graft.web

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Distributed integer PageRank ≡ a sequential single-threaded replay
  * (exact equality — every op is integer floor arithmetic).
  */
class LinkGraphSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("5 rounds over the synthetic link set match a sequential replay exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val n = docs.count()
    val edges = LinkGraph.syntheticEdges(docs, n)
    val got = LinkGraph.pagerank(docs, edges, n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val ids = docs.collect().map(_.getLong(0)).toSeq
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(outdeg.values.forall(d => d == 2L || d == 3L))
    val tele = 150000000L / n
    var rank = ids.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 5) {
      val s = es.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => rank(src) / outdeg(src) }.sum).toMap
      rank = ids.map(u => u -> (tele + 85L * s.getOrElse(u, 0L) / 100L)).toMap
    }
    assert(got == rank)
    // rank mass stays within teleport-truncation loss of 1e9 ppb
    val total = rank.values.sum
    assert(total > 800000000L && total <= 1000000000L)
  }

  test("synthetic edges: no self-links, distinct, deterministic") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val n = docs.count()
    val e = LinkGraph.syntheticEdges(docs, n).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.forall { case (s, d) => s != d && d >= 0 && d < n })
    assert(e.distinct.length == e.length)
  }
}
