package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Two-parallelism-level evidence run for token-budget mixture selection
  * (q91) under ADVERSARIAL domain skew: one mega-domain holds 30 % of the
  * corpus while 997 small domains share the rest. A
  * `Window.partitionBy(domain)` formulation would serialise the
  * mega-domain's running sum into a single task (the same cliff the
  * round-3 percolated regime measured for flatMapGroups); mixtureSelect's
  * two-phase range prefix sum spreads it across range partitions, so the
  * skewed input must scale like the uniform one. The identical job runs
  * at local[LO] and local[HI], alternating REPS times, min per config;
  * (rows, checksum, selected count) MUST be bit-identical across every
  * run — md5 admission order, integer token sums, integer ppm quota
  * arithmetic: no floats on the selection path, no RNG.
  *
  * Usage: SPARK_GRAFT_CORPUS_N=2000000 SPARK_GRAFT_CORPUS_REPS=2
  *        sbt 'runMain graft.tools.MixtureAtScale'
  */
object MixtureAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, docsPerSec: Double,
      rows: Long, chk: Long, nSel: Long, selTok: Long)

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-mixture-at-scale-$cpus")
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
      // 30 % of docs land in mega-domain s0; the rest spread over s1..s997
      val docs = DedupAtScale.documents(spark, n)
        .withColumn("source",
          when(col("doc_id") % 10 < 3, lit("s0"))
            .otherwise(concat(lit("s"),
              (col("doc_id") % 997 + 1).cast("string"))))
        .localCheckpoint(true)
      // 64 tokens/doc → budget = a quarter of the corpus token mass, so
      // the cut bites inside every domain including the mega-domain
      val budget = 16L * n
      val t0 = System.nanoTime()
      val r = TextOps.mixtureSelect(docs, "doc_id", "source", "text", budget)
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("n_tokens"), col("cum_tokens"),
            col("selected"))).as("chk"),
          sum(col("selected")).as("n_sel"),
          sum(col("selected") * col("n_tokens")).as("sel_tok"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall,
        r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CORPUS_N", "2000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CORPUS_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[mixture-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs docs/sec=${res.docsPerSec}%.0f " +
          f"rows=${res.rows}%d chk=${res.chk}%d n_sel=${res.nSel}%d " +
          f"sel_tok=${res.selTok}%d")
        res
      }
    }
    require(
      runs.map(r => (r.rows, r.chk, r.nSel, r.selTok)).distinct.size == 1,
      s"mixture results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.chk, r.nSel)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"mixture_at_scale","n":$n,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""chk":${runs.head.chk},"n_sel":${runs.head.nSel}}""")
  }
}
