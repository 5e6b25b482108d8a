package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Two-parallelism-level evidence run for the bigram-LM quality signal
  * (q94) at millions of documents: the corpus bigram table is an order
  * of magnitude wider than any unigram table (the q85/q87 family), so
  * this is the stress case for the broadcast-head/shuffle-tail split —
  * the Zipf head of contexts AND of bigrams joins from broadcast while
  * the long tail shuffles with no hot key. The identical job runs at
  * local[LO] and local[HI], alternating REPS times, min per config;
  * (rows, checksum, total bits) MUST be bit-identical across every run
  * (integer bitlen arithmetic end to end — no floats, no RNG).
  *
  * Usage: SPARK_GRAFT_CORPUS_N=1000000 SPARK_GRAFT_CORPUS_REPS=2
  *        sbt 'runMain graft.tools.LmAtScale'
  */
object LmAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, docsPerSec: Double,
      rows: Long, chk: Long, bits: Long)

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-lm-at-scale-$cpus")
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
      val r = TextOps.bigramLmBits(docs, "doc_id", "text")
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("n_bigrams"), col("lm_bits")))
            .as("chk"),
          sum(col("lm_bits")).as("bits"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall,
        r.getLong(0), r.getLong(1), r.getLong(2))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CORPUS_N", "1000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CORPUS_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[lm-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs docs/sec=${res.docsPerSec}%.0f " +
          f"rows=${res.rows}%d chk=${res.chk}%d bits=${res.bits}%d")
        res
      }
    }
    require(
      runs.map(r => (r.rows, r.chk, r.bits)).distinct.size == 1,
      s"lm results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.chk, r.bits)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"lm_at_scale","n":$n,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""chk":${runs.head.chk},"bits":${runs.head.bits}}""")
  }
}
