package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Two-parallelism-level evidence run for the corpus-statistics family —
  * Gopher repetition signals (q67) + rational TF-IDF top-k (q69) — on the
  * same deterministic 500k-doc corpus as [[DedupAtScale]]. The identical
  * job at local[LO] and local[HI], alternating REPS times, min per
  * config; both outputs' (rows, checksum) MUST be bit-identical across
  * parallelism levels (all-integer scoring, no floats, no RNG).
  *
  * Usage: SPARK_GRAFT_CORPUS_N=500000 SPARK_GRAFT_CORPUS_REPS=2
  *        sbt 'runMain graft.tools.CorpusStatsAtScale'
  */
object CorpusStatsAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, docsPerSec: Double,
      repRows: Long, repChk: Long, tfRows: Long, tfChk: Long)

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-corpus-stats-at-scale-$cpus")
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
      val docs = DedupAtScale.documents(spark, n).localCheckpoint(true)
      val t0 = System.nanoTime()
      val rep = TextOps.repetitionStats(docs, "doc_id", "text")
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("n_tokens"), col("top2_e6"),
            col("dup2_e6"), col("top3_e6"), col("dup3_e6"))).as("chk"))
        .head()
      val tf = TextOps.tfidfTopTerms(docs, "doc_id", "text", 3)
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("term"), col("tf"), col("df"),
            col("score_e6"), col("rnk"))).as("chk"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall,
        rep.getLong(0), rep.getLong(1), tf.getLong(0), tf.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CORPUS_N", "500000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CORPUS_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[corpus-stats-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs docs/sec=${res.docsPerSec}%.0f " +
          f"rep=(${res.repRows}%d,${res.repChk}%d) " +
          f"tfidf=(${res.tfRows}%d,${res.tfChk}%d)")
        res
      }
    }
    require(
      runs.map(r => (r.repRows, r.repChk, r.tfRows, r.tfChk))
        .distinct.size == 1,
      s"corpus-stats results differ across runs: " +
        runs.map(r => (r.cpus, r.repRows, r.repChk, r.tfRows, r.tfChk)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"corpus_stats_at_scale","n":$n,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rep_rows":${runs.head.repRows},"rep_chk":${runs.head.repChk},""" +
        s""""tfidf_rows":${runs.head.tfRows},"tfidf_chk":${runs.head.tfChk}}""")
  }
}
