package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Evidence run for the Bloom-prefiltered incremental dedup (q83) at the
  * shape it exists for: a large accumulated snapshot vs a small daily
  * batch. Two claims are measured:
  *
  *  1. **Shuffle starvation of the big side.** The snapshot rows that
  *     survive the Bloom prefilter (and therefore enter the anti-join
  *     exchange) are counted and compared against the full snapshot —
  *     at snapshot:batch = 100:1 the prefilter should discard ~99 % of
  *     the big side before any shuffle, which is the whole point;
  *     `incremental` (no prefilter) is timed on the same input as the
  *     baseline.
  *  2. **Two-parallelism scaling (north rule).** The identical
  *     prefiltered job at local[LO] and local[HI], alternating REPS
  *     times, min per config; (rows, checksum) must be bit-identical
  *     across every run — md5-keyed min-aggregation has no
  *     order-dependence.
  *
  * Usage: SPARK_GRAFT_BLOOM_SNAP=20000000 SPARK_GRAFT_BLOOM_BATCH=200000
  *        SPARK_GRAFT_BLOOM_REPS=2 sbt 'runMain graft.tools.BloomDedupAtScale'
  */
object BloomDedupAtScale {

  /** Deterministic corpus: snapshot ids [0, nSnap); batch ids
    * [nSnap, nSnap+nBatch). ~30 % of batch texts duplicate a snapshot
    * text (multiplicative-stride spread so dup targets are scattered),
    * the rest are new; every text is a pure function of its id.
    */
  def snapshotDF(spark: SparkSession, nSnap: Long): DataFrame =
    spark.range(nSnap).selectExpr("id AS doc_id", s"${textOf("id")} AS text")

  def batchDF(spark: SparkSession, nSnap: Long, nBatch: Long): DataFrame =
    spark.range(nBatch).selectExpr(
      s"id + $nSnap AS doc_id",
      s"""CASE WHEN id % 10 < 3
         |  THEN ${textOf(s"(id * 7919) % $nSnap")}
         |  ELSE ${textOf(s"id + $nSnap")}
         |END AS text""".stripMargin.replace("\n", " "))

  /** 24 deterministic tokens derived from a bigint expression. */
  private def textOf(k: String): String =
    s"""array_join(transform(sequence(0, 23), j ->
       |  concat('t', (($k) * 1000003 + j * 40503) % 899981, '_', ($k) % 977)
       |), ' ')""".stripMargin.replace("\n", " ")

  final case class RunResult(
      cpus: Int, wallSec: Double, plainSec: Double, rows: Long, chk: Long,
      snapHits: Long, bloomShufB: Long, plainShufB: Long)

  /** Sums shuffle-write bytes of every stage completed while `f` runs —
    * the direct measurement of what the Bloom prefilter starves.
    */
  private def withShuffleBytes[T](spark: SparkSession)(f: => T): (T, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      Thread.sleep(500) // let the async listener bus drain
      (r, bytes.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  def runOnce(cpus: Int, nSnap: Long, nBatch: Long,
              timePlain: Boolean): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bloom-dedup-at-scale-$cpus")
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
      val snap = snapshotDF(spark, nSnap).localCheckpoint(true)
      val batch = batchDF(spark, nSnap, nBatch).localCheckpoint(true)

      // instrumented replica of incrementalBloom's prefilter to count
      // the snapshot rows that survive into the anti-join exchange
      val bloom = Dedup.bloomOver(
        batch.select(md5(col("text")).as("text_md5")), "text_md5",
        estimatedItems = nBatch, numBits = nBatch * 16)
      val snapHits = snap.select(md5(col("text")).as("text_md5"))
        .filter(Dedup.mightContain(bloom, col("text_md5"))).count()

      val t0 = System.nanoTime()
      val (out, bloomShufB) = withShuffleBytes(spark) {
        Dedup.incrementalBloom(snap, batch, "doc_id", "text",
            estimatedItems = nBatch, numBits = nBatch * 16)
          .agg(count(lit(1)).as("rows"),
            sum(xxhash64(col("text_md5"), col("keep_id"))).as("chk"))
          .head()
      }
      val wall = (System.nanoTime() - t0) / 1e9

      val (plain, plainShufB) = if (timePlain) {
        val p0 = System.nanoTime()
        val (pr, b) = withShuffleBytes(spark) {
          Dedup.incremental(snap, batch, "doc_id", "text")
            .agg(count(lit(1)).as("rows"),
              sum(xxhash64(col("text_md5"), col("keep_id"))).as("chk"))
            .head()
        }
        require(pr.getLong(0) == out.getLong(0) &&
          pr.getLong(1) == out.getLong(1),
          s"plain vs bloom mismatch: $pr vs $out")
        ((System.nanoTime() - p0) / 1e9, b)
      } else (0.0, 0L)

      RunResult(cpus, wall, plain, out.getLong(0), out.getLong(1), snapHits,
        bloomShufB, plainShufB)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nSnap = sys.env.getOrElse("SPARK_GRAFT_BLOOM_SNAP", "20000000").toLong
    val nBatch = sys.env.getOrElse("SPARK_GRAFT_BLOOM_BATCH", "200000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BLOOM_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        // the plain (unfiltered) baseline is timed only at HI — it
        // exists to price the prefilter, not to scale-test
        val res = runOnce(cpus, nSnap, nBatch, timePlain = cpus == hi)
        println(f"[bloom-dedup-at-scale] rep=$r cpus=${res.cpus}%d " +
          f"snap=$nSnap%d batch=$nBatch%d wall=${res.wallSec}%.1fs " +
          f"plain=${res.plainSec}%.1fs snap_hits=${res.snapHits}%d " +
          f"shuffle=(${res.bloomShufB}%d vs ${res.plainShufB}%d plain) " +
          f"out=(${res.rows}%d,${res.chk}%d)")
        res
      }
    }
    require(runs.map(r => (r.rows, r.chk, r.snapHits)).distinct.size == 1,
      s"bloom-dedup results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.chk, r.snapHits)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val tPlain = byCpus(hi).map(_.plainSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    val hiRuns = byCpus(hi)
    val bShuf = hiRuns.map(_.bloomShufB).min
    val pShuf = hiRuns.map(_.plainShufB).min
    println(
      s"""{"metric":"bloom_dedup_at_scale","n_snap":$nSnap,""" +
        s""""n_batch":$nBatch,"snap_hits":${runs.head.snapHits},""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""t_plain_hi_s":${f"$tPlain%.1f"},""" +
        s""""shuffle_bloom_b":$bShuf,"shuffle_plain_b":$pShuf,""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rows":${runs.head.rows},"chk":${runs.head.chk}}""")
  }
}
