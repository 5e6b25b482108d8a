package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.web.LinkGraph

/** Two-parallelism-level evidence run for the iterative peel/propagate
  * family: bounded k-core peel (q101) and synchronous label propagation
  * (q107) on a large hierarchy-shaped div-graph (`dst = src div {2,3}`,
  * ~2n directed edges — the same edge rule as the queries, scaled).
  *
  * What this evidences:
  *   - the frontier claim: k-core round 1 pays the full-degree groupBy,
  *     rounds 2+ touch only edges incident to the just-removed set —
  *     the tool prints removed-per-round so the shrinking frontier is
  *     visible in the artifact (at n=16M the div-graph peels roughly
  *     half its remaining leaves per round, like the sf0.01 fixture);
  *   - determinism: (rows, checksums, per-round removal counts, label
  *     mass) MUST be bit-identical at local[LO] and local[HI] and
  *     across reps — both loops are pure integer functions of the graph;
  *   - min-of-reps wall-times at both levels → scaling efficiency.
  *
  * Usage: SPARK_GRAFT_PEEL_N=16000000 SPARK_GRAFT_PEEL_REPS=2
  *        sbt 'runMain graft.tools.GraphPeelAtScale'
  */
object GraphPeelAtScale {

  final case class RunResult(
      cpus: Int, kcoreSec: Double, lpaSec: Double,
      rows: Long, kcoreChk: Long, perRound: Seq[Long],
      lpaChk: Long, nLabels: Long)

  def runOnce(cpus: Int, n: Long, rounds: Int): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-peel-at-scale-$cpus")
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
      val nodes = spark.range(n).select(col("id").as("doc_id"))
        .localCheckpoint(true)
      val edges = LinkGraph.divEdges(nodes).localCheckpoint(true)

      val t0 = System.nanoTime()
      val kc = LinkGraph.kcorePeel(nodes, edges, k = 3, rounds = rounds)
        .localCheckpoint(true)
      val kr = kc.agg(count(lit(1)).as("rows"),
        sum(xxhash64(col("doc_id"), col("removed_round"), col("deg_final")))
          .as("chk")).head()
      val kcoreSec = (System.nanoTime() - t0) / 1e9
      val perRound = kc.groupBy("removed_round")
        .agg(count(lit(1)).as("c")).orderBy("removed_round")
        .collect().map(r => r.getLong(1)).toSeq

      val t1 = System.nanoTime()
      val lp = LinkGraph.labelPropagation(nodes, edges, rounds = rounds)
      val lr = lp.agg(
        sum(xxhash64(col("doc_id"), col("label"))).as("chk"),
        countDistinct(col("label")).as("nl")).head()
      val lpaSec = (System.nanoTime() - t1) / 1e9

      RunResult(cpus, kcoreSec, lpaSec, kr.getLong(0), kr.getLong(1),
        perRound, lr.getLong(0), lr.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PEEL_N", "16000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PEEL_REPS", "2").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PEEL_ROUNDS", "4").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n, rounds)
        println(f"[peel-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"kcore=${res.kcoreSec}%.1fs lpa=${res.lpaSec}%.1fs " +
          f"rows=${res.rows}%d kchk=${res.kcoreChk}%d " +
          f"perRound=${res.perRound.mkString(",")} " +
          f"lchk=${res.lpaChk}%d labels=${res.nLabels}%d")
        res
      }
    }
    require(
      runs.map(r => (r.rows, r.kcoreChk, r.perRound, r.lpaChk, r.nLabels))
        .distinct.size == 1,
      s"results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.kcoreChk, r.lpaChk)))
    val byCpus = runs.groupBy(_.cpus)
    def eff(f: RunResult => Double): (Double, Double, Double) = {
      val tLo = byCpus(lo).map(f).min
      val tHi = byCpus(hi).map(f).min
      (tLo, tHi, (tLo / tHi) / (hi.toDouble / lo))
    }
    val (kLo, kHi, kEff) = eff(_.kcoreSec)
    val (lLo, lHi, lEff) = eff(_.lpaSec)
    val h = runs.head
    println(
      s"""{"metric":"peel_at_scale","n":$n,"rounds":$rounds,""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,""" +
        s""""kcore_t_lo_s":${f"$kLo%.1f"},"kcore_t_hi_s":${f"$kHi%.1f"},""" +
        s""""kcore_efficiency":${f"$kEff%.3f"},""" +
        s""""lpa_t_lo_s":${f"$lLo%.1f"},"lpa_t_hi_s":${f"$lHi%.1f"},""" +
        s""""lpa_efficiency":${f"$lEff%.3f"},""" +
        s""""rows":${h.rows},"kcore_chk":${h.kcoreChk},""" +
        s""""removed_per_round":[${h.perRound.mkString(",")}],""" +
        s""""lpa_chk":${h.lpaChk},"n_labels":${h.nLabels}}""")
  }
}
