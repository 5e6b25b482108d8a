package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Two-parallelism-level evidence run for the curation family added late
  * in round 4 — deterministic stratified split (q84), exact-integer
  * Zipf-mass LM signal with the skew-split term join (q85), per-domain
  * repeated-5-gram boilerplate detection (q86) — over the same
  * deterministic corpus generator as [[DedupAtScale]], with a synthetic
  * 1000-domain column. The identical job at local[LO] and local[HI],
  * alternating REPS times, min per config; all three outputs'
  * (rows, checksum) MUST be bit-identical across every run (md5 bucket
  * arithmetic, integer bit lengths, integer ppm — no floats, no RNG).
  *
  * Usage: SPARK_GRAFT_CORPUS_N=500000 SPARK_GRAFT_CORPUS_REPS=2
  *        sbt 'runMain graft.tools.CurationAtScale'
  */
object CurationAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, docsPerSec: Double,
      splRows: Long, splChk: Long, zRows: Long, zChk: Long,
      bRows: Long, bChk: Long)

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-curation-at-scale-$cpus")
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
      val docs = DedupAtScale.documents(spark, n)
        .withColumn("source",
          concat(lit("s"), (col("doc_id") % 1000).cast("string")))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val spl = TextOps.stratifiedSplit(docs, "doc_id", "text")
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("bucket"), col("split"))).as("chk"))
        .head()
      val z = TextOps.zipfMass(docs, "doc_id", "text")
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("n_tokens"), col("n_terms"),
            col("zipf_bits"))).as("chk"))
        .head()
      val b = TextOps.boilerplateStats(docs, "doc_id", "source", "text")
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("n_grams"), col("n_boiler"),
            col("boiler_ppm"))).as("chk"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall,
        spl.getLong(0), spl.getLong(1), z.getLong(0), z.getLong(1),
        b.getLong(0), b.getLong(1))
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
        println(f"[curation-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs docs/sec=${res.docsPerSec}%.0f " +
          f"split=(${res.splRows}%d,${res.splChk}%d) " +
          f"zipf=(${res.zRows}%d,${res.zChk}%d) " +
          f"boiler=(${res.bRows}%d,${res.bChk}%d)")
        res
      }
    }
    require(
      runs.map(r => (r.splRows, r.splChk, r.zRows, r.zChk, r.bRows, r.bChk))
        .distinct.size == 1,
      s"curation results differ across runs: " +
        runs.map(r => (r.cpus, r.splChk, r.zChk, r.bChk)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"curation_at_scale","n":$n,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""split_chk":${runs.head.splChk},"zipf_chk":${runs.head.zChk},""" +
        s""""boiler_chk":${runs.head.bChk}}""")
  }
}
