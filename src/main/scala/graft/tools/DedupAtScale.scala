package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Two-parallelism-level evidence run for the text near-dup pipeline —
  * MinHash-LSH candidates → exact n-gram Jaccard verify → CC cluster
  * collapse (the q32/q59/q64 operators) — on a deterministic corpus with
  * planted near-dup families. Same shape as [[IvfAtScale]]: the identical
  * job at local[LO] and local[HI], alternating REPS times, min per
  * config; the collapse output (rows, cluster count, checksum) MUST be
  * bit-identical across parallelism levels (md5-derived hashes and
  * min-id CC labels are order-free).
  *
  * Usage: SPARK_GRAFT_DEDUP_N=500000 SPARK_GRAFT_DEDUP_REPS=2
  *        sbt 'runMain graft.tools.DedupAtScale'
  */
object DedupAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, docsPerSec: Double,
      rows: Long, clusters: Long, checksum: Long)

  /** n docs in families of 4: one base + three single-token perturbations.
    * Tokens are family-suffixed, so shingle spaces are disjoint across
    * families (cross-family Jaccard = 0) while within a family the
    * pairwise 3-shingle Jaccard is ≈ 0.82–0.90 — far above the 0.5
    * verify threshold and high enough that 16×4 banding recall is ≈ 1,
    * so the expected collapse is n/4 clusters of size 4. Pure function
    * of doc_id — identical at any parallelism.
    */
  def documents(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr(
      "id AS doc_id",
      """array_join(transform(sequence(0, 63), j ->
        |  CASE WHEN id % 4 > 0
        |            AND j = CAST((id DIV 4 + (id % 4) * 17) % 64 AS INT)
        |    THEN concat('x', id % 4, '_', id DIV 4)
        |    ELSE concat('w', ((id DIV 4) * 1000003 + j * 40503) % 50021,
        |                 '_', id DIV 4)
        |  END), ' ') AS text""".stripMargin.replace("\n", " "))

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-dedup-at-scale-$cpus")
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
      val docs = documents(spark, n).localCheckpoint(true)
      val t0 = System.nanoTime()
      // the distinct shingle-hash set is staged+checkpointed ONCE and
      // feeds both banding and exact verify; no broadcast hints (unlike
      // the sf0.01 query path): at this scale the candidate set is
      // ~1.5n rows and AQE should pick the join strategy from runtime
      // sizes
      val sets = docs.select(col("doc_id").as("id"),
        Dedup.distinctShingleHashes(col("text")).as("hs"))
        .localCheckpoint(true)
      val cand = Dedup.minhashCandidatesFromHashes(sets)
      val withA = sets
        .select(col("id").as("id_a"), col("hs").as("hs_a"))
        .join(cand, Seq("id_a"))
      val pairs = sets
        .select(col("id").as("id_b"), col("hs").as("hs_b"))
        .join(withA, Seq("id_b"))
        .filter(Dedup.jaccardByHashSets(col("hs_a"), col("hs_b")) >= 0.5)
        .select("id_a", "id_b")
      val collapsed = Dedup.nearDupCollapse(pairs, docs.select("doc_id"), "doc_id")
      val agg = collapsed.agg(
        count(lit(1)).as("rows"),
        sum(when(col("is_survivor") === 1L, 1L).otherwise(0L)).as("clusters"),
        sum(xxhash64(col("doc_id"), col("survivor"), col("cluster_size")))
          .as("chk")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, n / wall, agg.getLong(0), agg.getLong(1),
        agg.getLong(2))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_N", "500000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_DEDUP_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[dedup-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs docs/sec=${res.docsPerSec}%.0f " +
          f"rows=${res.rows}%d clusters=${res.clusters}%d " +
          f"checksum=${res.checksum}%d")
        res
      }
    }
    require(runs.map(r => (r.rows, r.clusters, r.checksum)).distinct.size == 1,
      s"collapse results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.clusters, r.checksum)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"dedup_at_scale","n":$n,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rows":${runs.head.rows},"clusters":${runs.head.clusters},""" +
        s""""checksum":${runs.head.checksum}}""")
  }
}
