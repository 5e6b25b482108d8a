package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.fixtures.Synthetic

/** Two-parallelism-level evidence run for the IVF ANN operator
  * (Dedup.ivfCosineTopK) — the same shape as graft.Scaling: the identical
  * job at local[LO] and local[HI] on the same deterministic input,
  * alternating REPS times and taking the min per config to resist
  * co-tenant steal bursts (BENCH.md "sandbox measurement quality").
  * The result checksum and row count MUST be bit-identical across
  * parallelism levels (the operator is deterministic by construction:
  * integer-quantized centroid sums, broadcast scans, per-list top-k).
  *
  * Usage: SPARK_GRAFT_IVF_N=1000000 SPARK_GRAFT_IVF_REPS=2
  *        sbt 'runMain graft.tools.IvfAtScale'
  */
object IvfAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, vecsPerSec: Double,
      rows: Long, checksum: Long)

  def runOnce(cpus: Int, n: Long, nlist: Int, nprobe: Int, k: Int): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-ivf-at-scale-$cpus")
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
      val res = Dedup.ivfCosineTopK(emb, "vec_id", "embedding", k,
        nlist = nlist, nprobe = nprobe)
      val agg = res.agg(
        count(lit(1)).as("rows"),
        sum(xxhash64(col("qid"), col("nid"), col("rank"),
          floor(col("sim") * 1000000.0 + 0.5))).as("chk")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall, agg.getLong(0), agg.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_IVF_N", "1000000").toLong
    val nlist = sys.env.getOrElse("SPARK_GRAFT_IVF_NLIST", "1024").toInt
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_IVF_NPROBE", "4").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_IVF_K", "10").toInt
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_IVF_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n, nlist, nprobe, k)
        println(f"[ivf-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs vecs/sec=${res.vecsPerSec}%.0f " +
          f"rows=${res.rows}%d checksum=${res.checksum}%d")
        res
      }
    }
    val byCpus = runs.groupBy(_.cpus)
    require(runs.map(r => (r.rows, r.checksum)).distinct.size == 1,
      s"IVF results differ across runs: ${runs.map(r => (r.cpus, r.rows, r.checksum))}")
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"ivf_at_scale","n":$n,"nlist":$nlist,"nprobe":$nprobe,"k":$k,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rows":${runs.head.rows},"checksum":${runs.head.checksum}}""")
  }
}
