package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.Synthetic

/** Evidence run for DISTRIBUTED D17 (longest source→mouth): run the
  * topo-DP + binary-lifting path on the river-forest fixture at millions
  * of edges, forced down the distributed branch (threshold 0), and print
  * an order-independent result checksum plus throughput — so two
  * parallelism levels evidence the north rule and a local-branch run
  * (SPARK_GRAFT_D17_COMPARE=1) evidences value equality at scale.
  *
  * Usage: SPARK_GRAFT_D17_EDGES=4000000 SPARK_GRAFT_D17_CHAINS=40000
  *        SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.D17AtScale'
  */
object D17AtScale {
  def main(args: Array[String]): Unit = {
    val nEdges = sys.env.getOrElse("SPARK_GRAFT_D17_EDGES", "4000000").toLong
    val nChains = sys.env.getOrElse("SPARK_GRAFT_D17_CHAINS", "40000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "4").toInt
    val compare = sys.env.getOrElse("SPARK_GRAFT_D17_COMPARE", "0") == "1"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-d17-at-scale")
      .config("spark.sql.shuffle.partitions", (cpus * mult).toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Synthetic.riverForest(spark, nEdges, nChains)
      .select("src", "dst", "len").localCheckpoint(true)

    def checksum(threshold: Long): (Long, Double, Long, Double) = {
      val t0 = System.nanoTime()
      val r = graft.pipeline.Extras.longestSourceMouth(e, spark, threshold)
        .select(col("mouth"), col("source"), col("dist_m"),
          xxhash64(col("mouth"), col("source"),
            floor(col("dist_m") * 10 + 0.5),
            concat_ws(",", col("path"))).as("h"))
        .agg(count(lit(1)), sum("dist_m"), sum("h")).head
      val wall = (System.nanoTime() - t0) / 1e9
      (r.getLong(0), r.getDouble(1), r.getLong(2), wall)
    }

    val (nM, sumD, ck, wall) = checksum(0L) // forced distributed
    val cmp = if (compare) {
      val (nL, sL, cL, wL) = checksum(Long.MaxValue) // forced local
      s""","local_mouths":$nL,"local_sum":$sL,"local_checksum":$cL,""" +
        s""""local_wall_sec":$wL,"values_equal":${nL == nM && sL == sumD && cL == ck}"""
    } else ""
    println(
      s"""{"metric":"d17_at_scale","n_edges":$nEdges,"n_chains":$nChains,""" +
        s""""cpus":$cpus,"n_mouths":$nM,"sum_dist":$sumD,"checksum":$ck,""" +
        s""""wall_sec":$wall,"edges_per_sec":${(nEdges / wall).toLong}$cmp}""")
    spark.stop()
  }
}
