package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.Synthetic
import graft.pipeline.Extras

/** Evidence run for the betweenness (P8) scale path on a comb
  * mega-component ([[FramesScale]]'s tree shape) or, with
  * `SPARK_GRAFT_BTW_SHAPE=cyclic`, on a RING comb — the trunk closed
  * into a cycle plus long-range chords, a conflict-free CYCLIC
  * mega-group (every trunk node is a pillar, so contraction meets no
  * duplicate/self-loop skip and local ≡ scale exactly; the conflicting
  * shapes are spec-pinned in BetweennessAtScaleSpec). Parity first
  * (values within 1e-9 of the exact port), then the scale path at two
  * parallelism levels — its output must be bit-identical across every
  * run (the distributed contraction and weights are order-free).
  *
  * Usage: SPARK_GRAFT_BTW_K=1500 SPARK_GRAFT_BTW_L=1500
  *        [SPARK_GRAFT_BTW_SHAPE=cyclic]
  *        SPARK_GRAFT_BTW_REPS=2 sbt 'runMain graft.tools.BetweennessScale'
  */
object BetweennessScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, rows: Long, topoChk: Long, valSum: Double,
      nEdges: Long)

  /** Comb with its trunk closed into a ring + `chords` long-range trunk
    * chords — cyclic, conflict-free (all trunk nodes are pillars).
    */
  def ringComb(spark: SparkSession, k: Long, l: Long, chords: Long): org.apache.spark.sql.DataFrame = {
    val step = math.max(1L, k / math.max(1L, chords))
    FramesScale.comb(spark, k, l)
      .unionByName(spark.range(1).selectExpr(s"${k - 1} AS src", "0 AS dst"))
      .unionByName(spark.range(chords).selectExpr(
        s"(id * $step) % $k AS src",
        s"((id * $step) + ($k DIV 2)) % $k AS dst"))
  }

  def runOnce(cpus: Int, k: Long, l: Long, threshold: Long): RunResult =
    runOnce(cpus, k, l, threshold, cyclic = false)

  def runOnce(cpus: Int, k: Long, l: Long, threshold: Long, cyclic: Boolean): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-betweenness-scale-$cpus")
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
      val base = if (cyclic) ringComb(spark, k, l, chords = 64L)
        else FramesScale.comb(spark, k, l)
      val edges = base.withColumn("comp", lit(1L)).localCheckpoint(true)
      // MEASURED distinct undirected edge count (ringComb chord ids can
      // collide as undirected pairs for some k — don't trust a formula)
      val nEdges = edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().count()
      val nodes = Synthetic.nodesForNids(
        edges.select(col("src").as("nid"))
          .unionByName(edges.select(col("dst").as("nid"))).distinct())
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val agg = Extras.betweennessGrouped(edges, nodes, spark,
          sizeThreshold = threshold)
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("comp"), col("src"), col("dst"), col("chain")))
            .as("topo"),
          sum(col("value")).as("vs"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, agg.getLong(0), agg.getLong(1), agg.getDouble(2),
        nEdges)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_BTW_K", "1500").toLong
    val l = sys.env.getOrElse("SPARK_GRAFT_BTW_L", "1500").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BTW_REPS", "2").toInt
    val cyclic = sys.env.get("SPARK_GRAFT_BTW_SHAPE").contains("cyclic")

    // parity at 64×64: identical topology, value sums within 1e-9 rel
    val pk = 64L; val pl = 64L
    val localR = runOnce(hi, pk, pl, Long.MaxValue, cyclic)
    val scaleR = runOnce(hi, pk, pl, 1L, cyclic)
    println(f"[btw-scale] parity k=$pk l=$pl local=(${localR.rows}," +
      f"${localR.topoChk},${localR.valSum}%.6f) ${localR.wallSec}%.1fs " +
      f"scale=(${scaleR.rows},${scaleR.topoChk},${scaleR.valSum}%.6f) " +
      f"${scaleR.wallSec}%.1fs")
    require(localR.rows == scaleR.rows && localR.topoChk == scaleR.topoChk &&
      math.abs(localR.valSum - scaleR.valSum) <=
        1e-9 * math.max(1.0, math.abs(localR.valSum)),
      "betweenness scale path diverged from the exact port at parity size")

    if (sys.env.get("SPARK_GRAFT_BTW_LOCAL_AT_SCALE").contains("1")) {
      val r = runOnce(hi, k, l, Long.MaxValue)
      println(f"[btw-scale] LOCAL port at k=$k l=$l cpus=$hi " +
        f"wall=${r.wallSec}%.1fs rows=${r.rows}%d topo=${r.topoChk}%d " +
        f"vals=${r.valSum}%.6f")
    }

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, k, l, 1L, cyclic)
        println(f"[btw-scale] rep=$r shape=${if (cyclic) "cyclic" else "tree"} " +
          f"cpus=$cpus wall=${res.wallSec}%.1fs rows=${res.rows}%d " +
          f"topo=${res.topoChk}%d vals=${res.valSum}%.6f")
        res
      }
    }
    require(runs.map(r => (r.rows, r.topoChk, r.valSum)).distinct.size == 1,
      s"betweenness output differs across runs: " +
        runs.map(r => (r.cpus, r.rows, r.topoChk, r.valSum)))
    val tLo = runs.filter(_.cpus == lo).map(_.wallSec).min
    val tHi = runs.filter(_.cpus == hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"betweenness_at_scale","edges":${runs.head.nEdges},""" +
        s""""shape":"${if (cyclic) "cyclic" else "tree"}",""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""rows":${runs.head.rows},"topo_chk":${runs.head.topoChk}}""")
  }
}
