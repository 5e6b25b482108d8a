package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Synthetic
import graft.pipeline.Extras

/** Evidence run for the frames (P6) scale path: a single chain-dominated
  * mega-component (a "comb": one trunk chain, one tributary chain per
  * trunk node — the river-network shape that motivated SURVEY §7.5.4)
  * where the exact single-task port would hold the WHOLE component in one
  * task, while the scale path's largest group is one chain.
  *
  *  1. PARITY at a size both paths can run: local ≡ scale, full output
  *     sets compared;
  *  2. SCALE at a size only the scale path should attempt, at two
  *     parallelism levels, reps alternating, min per config — output
  *     rows+checksum must be bit-identical across every run.
  *
  * Usage: SPARK_GRAFT_FRAMES_K=1500 SPARK_GRAFT_FRAMES_L=1500
  *        SPARK_GRAFT_FRAMES_REPS=2 sbt 'runMain graft.tools.FramesScale'
  */
object FramesScale {

  /** Comb component: trunk nodes 0..k-1 chained; tributary j = chain of
    * l nodes hanging off trunk node j. k·l + k − 1 edges, one component,
    * longest chain = l+1 — the scale path's task ceiling.
    */
  def comb(spark: SparkSession, k: Long, l: Long): DataFrame =
    spark.range(k * l + k - 1).selectExpr(
      s"""CASE WHEN id < $k * $l THEN
         |  CASE WHEN id % $l = 0 THEN id DIV $l
         |       ELSE $k + id - 1 END
         |ELSE id - $k * $l END AS src""".stripMargin.replace("\n", " "),
      s"""CASE WHEN id < $k * $l THEN $k + id
         |ELSE id - $k * $l + 1 END AS dst""".stripMargin.replace("\n", " "))

  final case class RunResult(
      cpus: Int, wallSec: Double, rows: Long, checksum: Long)

  def runOnce(cpus: Int, k: Long, l: Long, threshold: Long): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-frames-scale-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val edges = comb(spark, k, l).localCheckpoint(true)
      val nodes = Synthetic.nodesForNids(
        edges.select(col("src").as("nid"))
          .unionByName(edges.select(col("dst").as("nid"))).distinct())
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val agg = Extras.frames(edges, nodes, spark, threshold)
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("comp"), col("line_idx"), col("line"))).as("chk"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, agg.getLong(0), agg.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_FRAMES_K", "1500").toLong
    val l = sys.env.getOrElse("SPARK_GRAFT_FRAMES_L", "1500").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_FRAMES_REPS", "2").toInt

    // 1. parity: 64×64 comb (4159 edges), local vs scale, same session
    val pk = 64L; val pl = 64L
    val localR = runOnce(hi, pk, pl, Long.MaxValue)
    val scaleR = runOnce(hi, pk, pl, 1L)
    println(f"[frames-scale] parity k=$pk l=$pl local=(${localR.rows}," +
      f"${localR.checksum}) ${localR.wallSec}%.1fs scale=(${scaleR.rows}," +
      f"${scaleR.checksum}) ${scaleR.wallSec}%.1fs")
    require(localR.rows == scaleR.rows && localR.checksum == scaleR.checksum,
      "frames scale path diverged from the exact local port at parity size")

    // optional: price the single-task port at the full size for the
    // comparison headline (minutes of one-core A* — off by default)
    if (sys.env.get("SPARK_GRAFT_FRAMES_LOCAL_AT_SCALE").contains("1")) {
      val r = runOnce(hi, k, l, Long.MaxValue)
      println(f"[frames-scale] LOCAL path at k=$k l=$l cpus=$hi " +
        f"wall=${r.wallSec}%.1fs rows=${r.rows}%d chk=${r.checksum}%d")
    }

    // 2. scale: k·l-edge comb through the scale path only
    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, k, l, 1L)
        println(f"[frames-scale] rep=$r cpus=$cpus edges=${k * l + k - 1}%d " +
          f"wall=${res.wallSec}%.1fs rows=${res.rows}%d chk=${res.checksum}%d")
        res
      }
    }
    require(runs.map(r => (r.rows, r.checksum)).distinct.size == 1,
      s"frames output differs across runs: " +
        runs.map(r => (r.cpus, r.rows, r.checksum)))
    val tLo = runs.filter(_.cpus == lo).map(_.wallSec).min
    val tHi = runs.filter(_.cpus == hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"frames_at_scale","edges":${k * l + k - 1},""" +
        s""""longest_chain":${l + 1},"t_lo_s":${f"$tLo%.1f"},""" +
        s""""t_hi_s":${f"$tHi%.1f"},"cpus_lo":$lo,"cpus_hi":$hi,""" +
        s""""efficiency":${f"$eff%.3f"},"rows":${runs.head.rows},""" +
        s""""checksum":${runs.head.checksum}}""")
  }
}
