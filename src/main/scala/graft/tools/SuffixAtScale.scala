package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.SuffixArray

/** Two-parallelism-level evidence run for the ExactSubstr suffix-array
  * family (q109/q110) at tens of millions of suffix positions.
  *
  * The corpus is [[DedupAtScale.documents]] — 3 of every 4 docs are a
  * one-token edit of a base doc, so the corpus is saturated with long
  * cross-document verbatim runs: prefix-doubling rank classes stay FAT
  * for several rounds (the worst case for the densify step — a
  * distinct-suffix corpus exits after one round and proves nothing) and
  * the adjacent-pair LCP stage finds real duplicates, not zeros.
  *
  * The identical job (suffix ranks + adjacent-pair LCP + per-doc dup
  * stats) runs at local[LO] and local[HI], alternating REPS times, min
  * per config; (positions, sa checksum, dup checksum, total dup mass)
  * MUST be bit-identical across every run — the suffix order is a pure
  * function of the bytes, ties broken by (doc_id, pos).
  *
  * Usage: SPARK_GRAFT_SUFFIX_DOCS=30000 SPARK_GRAFT_CORPUS_REPS=2
  *        sbt 'runMain graft.tools.SuffixAtScale'
  */
object SuffixAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, posPerSec: Double,
      positions: Long, saChk: Long, dupChk: Long, dupMass: Long,
      rounds: Int, shuffleWriteMB: Long)

  def runOnce(cpus: Int, nDocs: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-suffix-at-scale-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * mult).toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // exchange-byte telemetry: total shuffle WRITE bytes across all
    // stages of the measured window (the doubling rounds dominate it)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val docs = DedupAtScale.documents(spark, nDocs).localCheckpoint(true)
      // let the corpus-build stages' async listener events drain BEFORE
      // zeroing, so they can't bleed into the measured window
      Thread.sleep(2000)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val sa = SuffixArray.saWithWindows(docs, "doc_id", "text")
        .localCheckpoint(true)
      val saAgg = sa.agg(count(lit(1)).as("n"),
        sum(xxhash64(col("doc_id"), col("pos"), col("sa_rank"))).as("chk"))
        .head()
      val dup = SuffixArray.dupSubstrStats(docs, sa, "doc_id")
        .agg(sum(xxhash64(col("doc_id"), col("n_dup_adj"),
          col("max_dup_len"), col("sum_dup_len"))).as("chk"),
          sum(col("sum_dup_len")).as("mass"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      // give the async listener bus a beat to drain before reading
      Thread.sleep(2000)
      RunResult(cpus, wall, saAgg.getLong(0) / wall,
        saAgg.getLong(0), saAgg.getLong(1), dup.getLong(0), dup.getLong(1),
        SuffixArray.lastDoublingRounds.get(), shuffleBytes.get() >> 20)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SUFFIX_DOCS", "30000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CORPUS_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, nDocs)
        println(f"[suffix-at-scale] rep=$r cpus=${res.cpus}%d " +
          f"docs=$nDocs%d positions=${res.positions}%d " +
          f"wall=${res.wallSec}%.1fs pos/sec=${res.posPerSec}%.0f " +
          f"rounds=${res.rounds}%d shuffle_write_mb=${res.shuffleWriteMB}%d " +
          f"sa_chk=${res.saChk}%d dup_chk=${res.dupChk}%d " +
          f"dup_mass=${res.dupMass}%d")
        res
      }
    }
    require(
      runs.map(r => (r.positions, r.saChk, r.dupChk, r.dupMass))
        .distinct.size == 1,
      s"suffix-array results differ across runs: " +
        runs.map(r => (r.cpus, r.positions, r.saChk, r.dupChk, r.dupMass)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"suffix_at_scale","docs":$nDocs,""" +
        s""""positions":${runs.head.positions},""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rounds":${runs.head.rounds},""" +
        // approximate: the async listener bus has no drain guarantee
        // around the fixed sleeps, so stray corpus-build events can
        // inflate (or late window events deflate) the tally — labeled so
        // BENCH evidence doesn't read it as exact (r5 ADVICE #3)
        s""""shuffle_write_mb_approx":${runs.map(_.shuffleWriteMB).min},""" +
        s""""sa_chk":${runs.head.saChk},"dup_chk":${runs.head.dupChk},""" +
        s""""dup_mass":${runs.head.dupMass}}""")
  }
}
