package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.web.LinkGraph

/** Two-parallelism-level evidence run for the link-graph centrality
  * family (q76): 5 exact-integer PageRank rounds over a synthetic
  * 3·n-edge link set at local[LO] vs local[HI], alternating REPS times,
  * min per config. Ranks are ppb BIGINTs computed with floor divisions
  * only, so (rows, Σ rank, checksum) MUST be bit-identical across
  * parallelism levels — asserted, not assumed.
  *
  * The 5 rounds compile into ONE physical plan; the edge+outdeg join
  * subplan is identical in every round, so ReuseExchange materializes
  * its shuffle once and each round adds only the rank-frame exchanges
  * (O(V) rank rows + O(E) contribution rows — the canonical distributed
  * PageRank cost).
  *
  * Usage: SPARK_GRAFT_PR_N=8000000 SPARK_GRAFT_PR_REPS=2
  *        sbt 'runMain graft.tools.PagerankAtScale'
  */
object PagerankAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, edgesPerSec: Double,
      rows: Long, totalRank: Long, checksum: Long)

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-pagerank-at-scale-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * mult).toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val nodes = spark.range(n).select(col("id").as("doc_id"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val edges = LinkGraph.syntheticEdges(nodes, n)
      val r = LinkGraph.pagerank(nodes, edges, n)
      val agg = r.agg(
        count(lit(1)).as("rows"),
        sum(col("rank_ppb")).as("total"),
        sum(xxhash64(col("doc_id"), col("rank_ppb"))).as("chk")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, 3.0 * n / wall, agg.getLong(0), agg.getLong(1),
        agg.getLong(2))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PR_N", "8000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "4").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "16").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PR_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[pagerank-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs edges/sec=${res.edgesPerSec}%.0f " +
          f"rows=${res.rows}%d total_rank=${res.totalRank}%d " +
          f"checksum=${res.checksum}%d")
        res
      }
    }
    require(
      runs.map(r => (r.rows, r.totalRank, r.checksum)).distinct.size == 1,
      s"rank results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.totalRank, r.checksum)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"pagerank_at_scale","n":$n,"edges_nominal":${3 * n},""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rows":${runs.head.rows},"total_rank":${runs.head.totalRank},""" +
        s""""checksum":${runs.head.checksum}}""")
  }
}
