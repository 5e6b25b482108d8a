package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Synthetic
import graft.graph.WaterwayFeatures

/** Evidence run for the D16 grouped-waterways scale path
  * ([[graft.graph.DistContractDir]] → pillar replay → distributed
  * expansion): ONE directed river comb tag group — a trunk flowing to a
  * single mouth with one tributary chain per trunk node — where the
  * single-task walk would hold every edge, map and walk structure of the
  * whole group in one task, while the scale path's largest graph task is
  * one chain (the final feature-string concat holds only the output
  * bytes, the floor for a one-feature-per-group sink).
  *
  *  1. PARITY at a size both paths can run: features compared
  *     byte-for-byte;
  *  2. SCALE at a size only the scale path should attempt, at two
  *     parallelism levels, reps alternating, min per config — rows and
  *     feature checksum must be bit-identical across every run (all
  *     scalar sums in the fixture are dyadic, so shuffle order cannot
  *     move them).
  *
  * Usage: SPARK_GRAFT_D16_K=1500 SPARK_GRAFT_D16_L=1500
  *        SPARK_GRAFT_D16_REPS=2 sbt 'runMain graft.tools.D16WalkScale'
  */
object D16WalkScale {

  /** Directed comb: trunk 0→1→…→k-1 (mouth k-1); tributary j = chain of
    * l nodes k+j·l … k+j·l+l-1 flowing into trunk node j. One tag group,
    * k·l + k − 1 edges, longest chain ≈ l. */
  def comb(spark: SparkSession, k: Long, l: Long): DataFrame =
    spark.range(k * l + k - 1).selectExpr(
      s"CASE WHEN id < $k * $l THEN $k + id ELSE id - $k * $l END AS src",
      s"""CASE WHEN id < $k * $l THEN
         |  CASE WHEN id % $l = $l - 1 THEN id DIV $l ELSE $k + id + 1 END
         |ELSE id - $k * $l + 1 END AS dst""".stripMargin.replace("\n", " "))

  final case class RunResult(
      cpus: Int, wallSec: Double, rows: Long, checksum: Long)

  private def features(
      spark: SparkSession, k: Long, l: Long, threshold: Long): DataFrame = {
    val edges = comb(spark, k, l).localCheckpoint(true)
    val tg = edges.select(col("src"), col("dst"), lit("R").as("tag"),
      lit(0L).as("tag_group_nid"))
    val lens = edges.select(col("src"), col("dst"), lit(1.0).as("len"))
    // dyadic flows varying by edge → junction decisions exercise the
    // flow-desc pick everywhere
    val flows = edges.select(col("src"), col("dst"),
      (((col("src") * 7 + col("dst")) % 16).cast("double") * 0.25)
        .as("flow_m"))
    val nodes = Synthetic.nodesForNids(
      edges.select(col("src").as("nid"))
        .unionByName(edges.select(col("dst").as("nid"))).distinct())
      .localCheckpoint(true)
    WaterwayFeatures.groupedWaterwayFeatures(
      tg, lens, flows, nodes, sizeThreshold = threshold)
  }

  def runOnce(cpus: Int, k: Long, l: Long, threshold: Long): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-d16-walk-scale-$cpus")
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
      val t0 = System.nanoTime()
      val agg = features(spark, k, l, threshold)
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("gkey"), col("feature"))).as("chk"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, agg.getLong(0), agg.getLong(1))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_D16_K", "1500").toLong
    val l = sys.env.getOrElse("SPARK_GRAFT_D16_L", "1500").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_D16_REPS", "2").toInt

    // 1. parity: byte-for-byte feature compare, local vs scale
    val pk = 48L; val pl = 48L
    val spark0 = SparkSession.builder().master(s"local[$hi]")
      .appName("graft-d16-parity")
      .config("spark.sql.shuffle.partitions", (hi * 4).toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    val localF = features(spark0, pk, pl, Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val scaleF = features(spark0, pk, pl, 1L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    spark0.stop()
    require(localF == scaleF && localF.nonEmpty,
      "D16 scale path diverged from the single-task walk at parity size")
    println(s"[d16-walk-scale] parity k=$pk l=$pl groups=${localF.size} " +
      s"bytes=${localF.values.map(_.length).sum} byte-identical")

    // optional: price the single-task walk at full size for the headline
    if (sys.env.get("SPARK_GRAFT_D16_LOCAL_AT_SCALE").contains("1")) {
      val r = runOnce(hi, k, l, Long.MaxValue)
      println(f"[d16-walk-scale] LOCAL path at k=$k l=$l cpus=$hi " +
        f"wall=${r.wallSec}%.1fs rows=${r.rows}%d chk=${r.checksum}%d")
    }

    // 2. scale: the full comb through the scale path only
    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, k, l, 1L)
        println(f"[d16-walk-scale] rep=$r cpus=$cpus " +
          f"edges=${k * l + k - 1}%d wall=${res.wallSec}%.1fs " +
          f"rows=${res.rows}%d chk=${res.checksum}%d")
        res
      }
    }
    require(runs.map(r => (r.rows, r.checksum)).distinct.size == 1,
      s"D16 output differs across runs: " +
        runs.map(r => (r.cpus, r.rows, r.checksum)))
    val tLo = runs.filter(_.cpus == lo).map(_.wallSec).min
    val tHi = runs.filter(_.cpus == hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"d16_walk_at_scale","edges":${k * l + k - 1},""" +
        s""""longest_chain":$l,"t_lo_s":${f"$tLo%.1f"},""" +
        s""""t_hi_s":${f"$tHi%.1f"},"cpus_lo":$lo,"cpus_hi":$hi,""" +
        s""""efficiency":${f"$eff%.3f"},"rows":${runs.head.rows},""" +
        s""""checksum":${runs.head.checksum}}""")
  }
}
