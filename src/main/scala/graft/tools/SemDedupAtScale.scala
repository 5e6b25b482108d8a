package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Two-parallelism-level evidence run for the SemDeDup operator (q73):
  * integer-exact k-means over synthetic embeddings with planted near-dup
  * pairs, then within-cluster cosine CC collapse. Same harness shape as
  * [[DedupAtScale]]: the identical job at local[LO] and local[HI],
  * alternating REPS times, min per config; (rows, survivors, checksum)
  * MUST be bit-identical across parallelism levels — the k-means is pure
  * integer arithmetic and the CC labels are min-id, so any divergence is
  * a bug, not noise. Boundary-straddling pairs (the SemDeDup recall
  * tradeoff) are deterministic too and land in the checksum.
  *
  * Usage: SPARK_GRAFT_SEMDEDUP_N=200000 SPARK_GRAFT_SEMDEDUP_K=128
  *        sbt 'runMain graft.tools.SemDedupAtScale'
  */
object SemDedupAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, vecsPerSec: Double,
      rows: Long, survivors: Long, checksum: Long)

  /** n vectors in planted pairs: even ids are 64-dim hash-derived bases
    * in [-1,1]^64, odd ids perturb their base by ≤0.0015/component
    * (cosine ≥ 0.9999 to the base; random 64-dim cross-pair cosines
    * stay ≪ 0.99). Pure function of vec_id — identical at any
    * parallelism.
    */
  def embeddings(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr(
      "id AS vec_id",
      // xxhash64 mixing, NOT an affine (g*a + j*b) % p form: affine
      // generators make consecutive groups near-parallel (constant
      // per-component shift), which chain-merges whole clusters
      """transform(sequence(0, 63), j ->
        |  CAST(((xxhash64(id DIV 2, j) % 2000003) + 2000003) % 2000003
        |    AS DOUBLE) / 2000003.0 * 2 - 1
        |  + CASE WHEN id % 2 = 1
        |      THEN ((id * 31 + j) % 7 - 3) * 0.0005 ELSE 0.0 END)
        |AS v""".stripMargin.replace("\n", " "))

  def runOnce(cpus: Int, n: Long, k: Int): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-semdedup-at-scale-$cpus")
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
      val vecs = embeddings(spark, n).localCheckpoint(true)
      val t0 = System.nanoTime()
      // semanticDedup materializes the clustering eagerly (quantized
      // checkpoint, seeds, two Lloyd collects, final-assignment
      // checkpoint); the returned frame defers only pairs + CC + join
      val collapsed = Dedup.semanticDedup(vecs, "vec_id", "v",
        k = k, iters = 2, tauE6 = 990000L)
      val tCluster = (System.nanoTime() - t0) / 1e9
      println(f"[semdedup-at-scale]   cluster stage: $tCluster%.1fs")
      val agg = collapsed.agg(
        count(lit(1)).as("rows"),
        sum(when(col("is_survivor") === 1L, 1L).otherwise(0L))
          .as("survivors"),
        sum(xxhash64(col("vec_id"), col("cluster"), col("survivor"),
          col("comp_size"))).as("chk")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall, agg.getLong(0), agg.getLong(1),
        agg.getLong(2))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_N", "200000").toLong
    val k = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_K", "128").toInt
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n, k)
        println(f"[semdedup-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"k=$k%d wall=${res.wallSec}%.1fs vecs/sec=${res.vecsPerSec}%.0f " +
          f"rows=${res.rows}%d survivors=${res.survivors}%d " +
          f"checksum=${res.checksum}%d")
        res
      }
    }
    require(runs.map(r => (r.rows, r.survivors, r.checksum)).distinct.size == 1,
      s"semdedup results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.survivors, r.checksum)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"semdedup_at_scale","n":$n,"k":$k,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rows":${runs.head.rows},"survivors":${runs.head.survivors},""" +
        s""""checksum":${runs.head.checksum}}""")
  }
}
