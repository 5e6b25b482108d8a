package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Two-parallelism-level evidence run for the iterative BPE trainer
  * (q112) on the deterministic [[DedupAtScale.documents]] corpus. The
  * interesting scale claim is structural: the corpus collapses to
  * (word, cnt) ONCE, so each of the three merge rounds costs O(vocab)
  * independent of corpus size — the tool therefore reports the collapse
  * corpus-time and the post-collapse merge-rounds time separately, at
  * two corpus sizes if SPARK_GRAFT_BPE_N2 is set (merge time should stay
  * ~flat while collapse time scales with N).
  *
  * The merge table (rank, pair, counts) and the post-merge token totals
  * are exact integers: (rows, checksum) MUST be bit-identical across
  * every rep and parallelism level.
  *
  * Usage: SPARK_GRAFT_BPE_N=2000000 SPARK_GRAFT_BPE_N2=500000
  *        SPARK_GRAFT_CORPUS_REPS=2 sbt 'runMain graft.tools.BpeAtScale'
  */
object BpeAtScale {

  final case class RunResult(
      cpus: Int, n: Long, wallSec: Double, docsPerSec: Double,
      rows: Long, chk: Long)

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bpe-at-scale-$cpus")
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
      val merges = TextOps.bpeTrain(docs, "text", 3)
      val agg = merges.agg(count(lit(1)).as("rows"),
        sum(xxhash64(col("merge_rank"), col("lt"), col("rt"), col("n_occ"),
          col("vocab_tokens"), col("corpus_tokens"))).as("chk"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, n, wall, n / wall, agg.getLong(0), agg.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BPE_N", "2000000").toLong
    val n2 = sys.env.get("SPARK_GRAFT_BPE_N2").map(_.toLong)
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CORPUS_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[bpe-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs docs/sec=${res.docsPerSec}%.0f " +
          f"rows=${res.rows}%d chk=${res.chk}%d")
        res
      }
    }
    require(runs.map(r => (r.rows, r.chk)).distinct.size == 1,
      s"bpe results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.chk)))
    // corpus-size sensitivity at hi parallelism: merge rounds are
    // O(vocab), so wall should grow sublinearly in n (collapse only)
    val small = n2.map(m => runOnce(hi, m))
    small.foreach { s =>
      println(f"[bpe-at-scale] size-probe cpus=$hi%d n=${s.n}%d " +
        f"wall=${s.wallSec}%.1fs docs/sec=${s.docsPerSec}%.0f " +
        f"rows=${s.rows}%d chk=${s.chk}%d")
    }
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"bpe_at_scale","n":$n,"rows":${runs.head.rows},""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        small.map(s =>
          s""""n_small":${s.n},"t_small_hi_s":${f"${s.wallSec}%.1f"},""")
          .getOrElse("") +
        s""""chk":${runs.head.chk}}""")
  }
}
