package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Synthetic
import graft.graph.{ConnectedComponents, GraphBuild}
import graft.geo.Geo

/** Two-parallelism-level scaling run (north rule surrogate, BASELINE.md):
  * the same lump job at local[8] and local[32] on the same deterministic
  * input. Reports wall-time, ways/sec, CC convergence rounds and an
  * output checksum per config — rounds and checksums MUST match (they are
  * parallelism-invariant); efficiency = (t_8 / t_32) / 4.
  *
  * Usage: SPARK_GRAFT_SCALE_WAYS=1000000 sbt 'runMain graft.Scaling'
  */
object Scaling {

  final case class RunResult(
      cpus: Int, wallSec: Double, waysPerSec: Double, ccRounds: Int,
      nComponents: Long, checksum: Long, totalLenM: Double,
      geomSegments: Long = -1L, geomLines: Long = -1L,
      geomCoveredEdges: Long = -1L)

  def runOnce(cpus: Int, nWays: Long, buckets: Long): RunResult = {
    // SPARK_GRAFT_SHUFFLE_MULT partitions-per-core (default 1 =
    // historical runs). Large inputs want >1: with exactly one partition
    // per core, a 16M-way run gives 16 concurrent ~1M-way sort/agg
    // tasks that spill; 4 finer waves fit in memory on BOTH configs.
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
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
      val t0 = System.nanoTime()
      val ways =
        if (sys.env.get("SPARK_GRAFT_NO_WAYS_CKPT").isDefined)
          Synthetic.ways(spark, nWays, buckets = buckets)
        else Synthetic.ways(spark, nWays, buckets = buckets).localCheckpoint(true)
      val edges = GraphBuild.canonicalUndirected(
        GraphBuild.contractedEdges(ways, spark))
        .toDF().localCheckpoint(true)
      // S3 semantics: only positions of needed nids (contracted endpoints)
      val needed = edges.select(col("src").as("nid"))
        .union(edges.select(col("dst").as("nid"))).distinct()
      val nodes = Synthetic.nodesForNids(needed).localCheckpoint(true)
      val cc = ConnectedComponents.run(edges.select("src", "dst"))
      // Invariants: component STRUCTURE (labels + per-component edge
      // counts) is exact at any parallelism and goes into the hash;
      // floating length sums are NOT reassociation-stable — at 16M ways
      // (~6M components) a decimetre-rounded per-component sum first
      // straddled a .5 boundary between summation orders — so total
      // length is compared with a relative tolerance instead of hashed.
      val lens = edges
        .join(cc.labels.withColumnRenamed("nid", "src"), Seq("src"))
        .join(nodes.select(col("nid").as("src"), col("lat").as("lat1"),
          col("lon").as("lon1")), Seq("src"))
        .join(nodes.select(col("nid").as("dst"), col("lat").as("lat2"),
          col("lon").as("lon2")), Seq("dst"))
        .groupBy("comp")
        .agg(count(lit(1)).as("n_edges"),
          expr("SUM(" +
            "2.0 * 6371008.8 * ASIN(SQRT(POW(SIN(RADIANS(lat2 - lat1) / 2.0), 2.0) + " +
            "COS(RADIANS(lat1)) * COS(RADIANS(lat2)) * " +
            "POW(SIN(RADIANS(lon2 - lon1) / 2.0), 2.0))))").as("len"))
      val summary = lens.agg(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(comp, n_edges))"), lit(0L)).as("x"),
        sum("len").as("total")).head()
      // optional sharded-geometry stage (SPARK_GRAFT_SCALE_GEOM=1): run
      // the DistPeel mega-component path over EVERY component with the
      // threshold forced low, so each component peels chunked + stitched
      // — the measured evidence that geometry assembly no longer needs a
      // whole component in one task. Invariants: covered segment pairs
      // == edge count (each edge exactly once), line/segment counts are
      // parallelism-independent (pure function of the data).
      val geom = sys.env.get("SPARK_GRAFT_SCALE_GEOM").map { _ =>
        val maxChunk = sys.env.getOrElse("SPARK_GRAFT_SCALE_GEOM_CHUNK",
          "200000").toLong
        val labelled = edges
          .join(cc.labels.withColumnRenamed("nid", "src"), Seq("src"))
          .join(nodes.select(col("nid").as("src"), col("lat").as("lat1"),
            col("lon").as("lon1")), Seq("src"))
          .join(nodes.select(col("nid").as("dst"), col("lat").as("lat2"),
            col("lon").as("lon2")), Seq("dst"))
          .select(col("comp"), col("src"), col("dst"),
            array(col("src"), col("dst")).as("nids"),
            array(col("lat1"), col("lat2")).as("lats"),
            array(col("lon1"), col("lon2")).as("lons"),
            col("lat1"), col("lon1"))
        val segs = graph.DistPeel.peelSegments(
          graph.DistPeel.withChunk(labelled, maxChunk), spark)
        val s = segs.agg(
          count(lit(1)).as("nsegs"),
          countDistinct(col("comp"), col("line_idx")).as("nlines"),
          sum(size(col("nids")) - 1).as("covered")).head()
        (s.getLong(0), s.getLong(1), s.getLong(2))
      }
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, wall, nWays / wall, cc.rounds,
        summary.getLong(0), summary.getLong(1), summary.getDouble(2),
        geom.map(_._1).getOrElse(-1L), geom.map(_._2).getOrElse(-1L),
        geom.map(_._3).getOrElse(-1L))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nWays = sys.env.getOrElse("SPARK_GRAFT_SCALE_WAYS", "200000").toLong
    // constant-density weak scaling: default keeps the historical 4096
    // (bit-reproducible 4M/8M rounds); pass ≈ n/1000 for bigger sizes
    val buckets = sys.env.getOrElse("SPARK_GRAFT_SCALE_BUCKETS",
      Synthetic.Buckets.toString).toLong
    // N and 4N parallelism levels (north rule). Default 8→32; 4→16 is
    // also valid N/4N and sits below the sandbox host's memory-bandwidth
    // saturation point (see BENCH.md host-ceiling probe).
    val cpusLo = sys.env.getOrElse("SPARK_GRAFT_CPUS_LO", "8").toInt
    val cpusHi = cpusLo * 4
    // The sandbox host has bursty CPU steal from co-tenants; alternate
    // configs and keep the best rep per config (min wall) so a steal
    // burst can't poison one side of the comparison.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val runs = (1 to reps).flatMap { r =>
      val a = runOnce(cpusLo, nWays, buckets)
      val b = runOnce(cpusHi, nWays, buckets)
      System.err.println(
        f"[scaling] rep $r: t$cpusLo=${a.wallSec}%.1f t$cpusHi=${b.wallSec}%.1f")
      Seq(a, b)
    }
    val lo = runs.filter(_.cpus == cpusLo).minBy(_.wallSec)
    val hi = runs.filter(_.cpus == cpusHi).minBy(_.wallSec)
    val eff = (lo.wallSec / hi.wallSec) / 4.0
    require(lo.ccRounds == hi.ccRounds,
      s"CC rounds differ across parallelism: ${lo.ccRounds} vs ${hi.ccRounds}")
    require(lo.nComponents == hi.nComponents && lo.checksum == hi.checksum,
      s"component structure differs across parallelism levels: " +
        s"n=${lo.nComponents}/${hi.nComponents} x=${lo.checksum}/${hi.checksum}")
    val lenRel = math.abs(lo.totalLenM - hi.totalLenM) /
      math.max(math.abs(lo.totalLenM), 1.0)
    require(lenRel < 1e-9,
      s"total length diverges beyond fp reassociation: $lenRel")
    // sharded-geometry invariants (when SPARK_GRAFT_SCALE_GEOM=1): the
    // peel is a pure function of the data — counts must be identical at
    // every parallelism, and coverage must equal the edge count exactly
    if (lo.geomSegments >= 0) {
      require(lo.geomSegments == hi.geomSegments &&
        lo.geomLines == hi.geomLines &&
        lo.geomCoveredEdges == hi.geomCoveredEdges,
        s"sharded geometry differs across parallelism: " +
          s"${(lo.geomSegments, lo.geomLines, lo.geomCoveredEdges)} vs " +
          s"${(hi.geomSegments, hi.geomLines, hi.geomCoveredEdges)}")
    }
    val geomJson =
      if (lo.geomSegments < 0) ""
      else s""""geom_segments":${lo.geomSegments},"geom_lines":${lo.geomLines},""" +
        s""""geom_covered_edges":${lo.geomCoveredEdges},"""
    println(
      s"""{"metric":"scaling","n_ways":$nWays,"buckets":$buckets,"cpus_lo":$cpusLo,"cpus_hi":$cpusHi,""" +
        s""""t_lo_sec":${lo.wallSec},"t_hi_sec":${hi.wallSec},""" +
        s""""ways_per_sec_lo":${lo.waysPerSec.toLong},"ways_per_sec_hi":${hi.waysPerSec.toLong},""" +
        s""""cc_rounds":${lo.ccRounds},"n_components":${lo.nComponents},""" +
        s""""checksum":${lo.checksum},"total_len_rel_diff":$lenRel,$geomJson""" +
        s""""efficiency":$eff}""")
  }
}
