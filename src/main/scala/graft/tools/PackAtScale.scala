package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.runtime.Ranks

/** Two-parallelism-level evidence run for GPT-style sequence packing
  * (q81's shape): the globally-coupled exact-integer prefix sum
  * ([[Ranks.withGlobalCumsumLong]]) + per-row explode to covering
  * sequences, on a deterministic synthetic corpus of (doc_id, n_tokens)
  * rows (packing reads only counts; tokenization is measured separately
  * in [[CorpusStatsAtScale]]). The identical job at local[LO] and
  * local[HI], alternating REPS times, min per config; (rows, token sum,
  * checksum, n_seqs) MUST be bit-identical across parallelism levels —
  * the prefix sum is exact-integer, so bin boundaries cannot drift.
  *
  * Usage: SPARK_GRAFT_PACK_N=50000000 SPARK_GRAFT_PACK_REPS=2
  *        sbt 'runMain graft.tools.PackAtScale'
  */
object PackAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, docsPerSec: Double,
      rows: Long, tokSum: Long, chk: Long, nSeqs: Long)

  private val SeqLen = 2048L

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-pack-at-scale-$cpus")
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
      // deterministic doc lengths, heavy-tailed-ish: 1..4096 tokens
      val docs = spark.range(n)
        .select(col("id").as("doc_id"),
          (pmod(xxhash64(col("id"), lit(0x9e3779b97f4a7c15L)), lit(4096L)) + 1L)
            .as("n"))
      val t0 = System.nanoTime()
      val packed = Ranks
        .withGlobalCumsumLong(docs, Seq(col("doc_id")), col("n"), "c")
        .withColumn("g", col("c") - col("n"))
        .withColumn("seq_id",
          explode(sequence(expr(s"g DIV ${SeqLen}L"), expr(s"(c - 1L) DIV ${SeqLen}L"))))
        .select(col("doc_id"), col("seq_id"),
          (greatest(col("g"), col("seq_id") * SeqLen) - col("g")).as("doc_off"),
          (least(col("c"), (col("seq_id") + 1L) * SeqLen) -
            greatest(col("g"), col("seq_id") * SeqLen)).as("n_tok"))
      val agg = packed.agg(
        count(lit(1)).as("rows"),
        sum(col("n_tok")).as("tok_sum"),
        sum(xxhash64(col("doc_id"), col("seq_id"), col("doc_off"),
          col("n_tok"))).as("chk"),
        (max(col("seq_id")) + 1L).as("n_seqs")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall,
        agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PACK_N", "50000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PACK_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[pack-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs docs/sec=${res.docsPerSec}%.0f " +
          f"rows=${res.rows}%d tok_sum=${res.tokSum}%d chk=${res.chk}%d " +
          f"n_seqs=${res.nSeqs}%d")
        res
      }
    }
    require(
      runs.map(r => (r.rows, r.tokSum, r.chk, r.nSeqs)).distinct.size == 1,
      s"packing results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.tokSum, r.chk, r.nSeqs)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"pack_at_scale","n":$n,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rows":${runs.head.rows},"tok_sum":${runs.head.tokSum},""" +
        s""""chk":${runs.head.chk},"n_seqs":${runs.head.nSeqs}}""")
  }
}
