package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.web.LinkGraph

/** Two-parallelism-level evidence run for degree-ordered triangle
  * counting (q93) on a HUB-SKEWED deterministic graph — the input class
  * the orientation bound exists for. q93's own synthetic edges have
  * max degree ~6, which never stresses the hub claim; here each node d
  * emits 3 links with a Zipf-shaped target `n div (1 + h(d,i))`, so
  * node 1 collects ~n/2 in-links (a genuine mega-hub) and the naive
  * neighbourhood self-join would enumerate ~(n/2)² wedges at that hub
  * alone (~10¹³ rows at n=6M). The degree-(then-id) orientation points
  * every hub edge INTO the hub, so the hub enumerates zero wedges and
  * the measured wedge volume stays O(E) on this degree mix — the tool
  * prints both numbers (`wedges_enumerated` vs `wedges_naive`) so the
  * bound is measured, not asserted.
  *
  * The identical job runs at local[LO] and local[HI], alternating REPS
  * times, min per config; (rows, checksum, total triangles) MUST be
  * bit-identical across every run (integer arithmetic end to end).
  *
  * Usage: SPARK_GRAFT_TRI_N=6000000 SPARK_GRAFT_TRI_REPS=2
  *        sbt 'runMain graft.tools.TrianglesAtScale'
  */
object TrianglesAtScale {

  final case class RunResult(
      cpus: Int, wallSec: Double, edgesPerSec: Double,
      rows: Long, chk: Long, tri3: Long)

  /** Zipf-target link set: in-degree of node v is ~n/v², max degree
    * ~n/2 at v=1 — deterministic, no RNG. */
  def hubEdges(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame =
    spark.range(n).select(col("id").as("src"),
        explode(array((0 to 2).map(i => expr(
          s"${n}L DIV (1L + pmod(id * 2654435761L + ${40503L * i + 7}L, ${n}L))")
        ): _*)).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  def runOnce(cpus: Int, n: Long): RunResult = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-triangles-at-scale-$cpus")
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
      val edges = hubEdges(spark, n).localCheckpoint(true)
      val t0 = System.nanoTime()
      val r = LinkGraph.triangleCounts(nodes, edges)
        .agg(count(lit(1)).as("rows"),
          sum(xxhash64(col("doc_id"), col("deg"), col("n_tri"),
            col("cc_ppm"))).as("chk"),
          sum(col("n_tri")).as("tri3"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, edges.count() / wall,
        r.getLong(0), r.getLong(1), r.getLong(2))
    } finally spark.stop()
  }

  /** Untimed wedge accounting on the same graph: what the oriented
    * algorithm enumerates (Σ C(oriented-outdeg, 2)) vs what a naive
    * per-vertex neighbourhood self-join would (Σ C(deg, 2)). */
  def wedgeStats(spark: SparkSession, n: Long): (Long, Long, Long, Long) = {
    val und = hubEdges(spark, n)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("x"))
      .unionAll(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val k = deg.select(col("x"), (col("deg") * lit(4294967296L) + col("x")).as("k"))
    val outdeg = und
      .join(k.select(col("x").as("u"), col("k").as("ku")), Seq("u"))
      .join(k.select(col("x").as("v"), col("k").as("kv")), Seq("v"))
      .select(when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("f"))
      .groupBy("f").agg(count(lit(1)).as("od"))
    val row = outdeg.agg(
      sum(expr("od * (od - 1) DIV 2")).as("enumerated")).head()
    val nv = deg.agg(
      sum(expr("deg * (deg - 1) DIV 2")).as("naive"),
      max(col("deg")).as("maxdeg"),
      count(lit(1)).as("nodes")).head()
    (row.getLong(0), nv.getLong(0), nv.getLong(1), nv.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_TRI_N", "6000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_TRI_REPS", "2").toInt

    val runs = (1 to reps).flatMap { r =>
      Seq(lo, hi).map { cpus =>
        val res = runOnce(cpus, n)
        println(f"[triangles-at-scale] rep=$r cpus=${res.cpus}%d n=$n%d " +
          f"wall=${res.wallSec}%.1fs edges/sec=${res.edgesPerSec}%.0f " +
          f"rows=${res.rows}%d chk=${res.chk}%d tri3=${res.tri3}%d")
        res
      }
    }
    require(
      runs.map(r => (r.rows, r.chk, r.tri3)).distinct.size == 1,
      s"triangle results differ across runs: " +
        runs.map(r => (r.cpus, r.rows, r.chk, r.tri3)))
    val byCpus = runs.groupBy(_.cpus)
    val tLo = byCpus(lo).map(_.wallSec).min
    val tHi = byCpus(hi).map(_.wallSec).min
    val eff = (tLo / tHi) / (hi.toDouble / lo)

    val spark = SparkSession.builder().master(s"local[$hi]")
      .appName("graft-triangles-wedge-stats")
      .config("spark.sql.shuffle.partitions", (hi * 4).toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (enumerated, naive, maxdeg, nodes) =
      try wedgeStats(spark, n) finally spark.stop()

    println(
      s"""{"metric":"triangles_at_scale","n":$n,""" +
        s""""t_lo_s":${f"$tLo%.1f"},"t_hi_s":${f"$tHi%.1f"},""" +
        s""""cpus_lo":$lo,"cpus_hi":$hi,"efficiency":${f"$eff%.3f"},""" +
        s""""chk":${runs.head.chk},"triangles":${runs.head.tri3 / 3},""" +
        s""""max_degree":$maxdeg,"nodes":$nodes,""" +
        s""""wedges_enumerated":$enumerated,"wedges_naive":$naive}""")
  }
}
