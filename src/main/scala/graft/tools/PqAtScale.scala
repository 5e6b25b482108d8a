package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Pq
import graft.fixtures.Synthetic

/** Two-parallelism-level evidence run for the PQ-ADC ANN operator
  * ([[graft.dedup.Pq.pqAdcTopK]], q111) at a million vectors — same
  * harness as IvfAtScale: the identical job at local[LO] and local[HI],
  * alternating REPS times, min per config. Codebook training, codes and
  * ADC distances are exact integers, so (rows, checksum) MUST be
  * bit-identical across parallelism levels.
  *
  * Usage: SPARK_GRAFT_PQ_N=1000000 SPARK_GRAFT_CORPUS_REPS=2
  *        sbt 'runMain graft.tools.PqAtScale'
  */
object PqAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, vecsPerSec: Double,
      rows: Long, checksum: Long)

  def runOnce(cpus: Int, n: Long, qmod: Long, k: Int): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-pq-at-scale-$cpus")
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
      val emb = Synthetic.embeddings(spark, n).localCheckpoint(true)
      val t0 = System.nanoTime()
      val res = Pq.pqAdcTopK(emb, "vec_id", "embedding", k,
        queryMod = qmod)
      val agg = res.agg(
        count(lit(1)).as("rows"),
        sum(xxhash64(col("qid"), col("rank"), col("nid"), col("adist")))
          .as("chk")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall, agg.getLong(0), agg.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PQ_N", "1000000").toLong
    val qmod = sys.env.getOrElse("SPARK_GRAFT_PQ_QMOD", "1000").toLong
    val k = sys.env.getOrElse("SPARK_GRAFT_PQ_K", "10").toInt
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CORPUS_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n, qmod, k)
        println(f"[pq-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs vecs/sec=${res.vecsPerSec}%.0f " +
          f"rows=${res.rows}%d chk=${res.checksum}%d")
        res
      }
    }
    require(runs.map(r => (r.rows, r.checksum)).distinct.size == 1,
      s"pq results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.checksum)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"pq_at_scale","n":$n,"rows":${runs.head.rows},""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""chk":${runs.head.checksum}}""")
  }
}
