package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directed-flow operators (SURVEY.md §2.6): end points, topological
  * frontier propagation of upstream metres with flow splitting.
  *
  * The reference walks a global topological order sequentially
  * (/root/reference/src/bin/osm-lump-ways-down/main.rs:805-910). Here the
  * walk is reformulated as batched frontier rounds (Pregel-in-DataFrames):
  * every round resolves *all* currently-ready nodes at once, so the round
  * count equals the DAG depth, independent of cluster size — a reported,
  * parallelism-invariant metric. Confluent because each node's value
  * depends only on its in-edges' finalised values (SURVEY.md §7.5.3).
  */
object Flow {

  /** D7 — end points: vertexes with no outgoing edge
    * (/root/reference/src/graph/directed_graph.rs:116-122).
    */
  def endPoints(edges: DataFrame): DataFrame =
    edges
      .select(col("dst").as("nid"))
      .distinct()
      .join(edges.select(col("src").as("nid")).distinct(), Seq("nid"), "left_anti")

  /** Source points: vertexes with no incoming edge. */
  def sourcePoints(edges: DataFrame): DataFrame =
    edges
      .select(col("src").as("nid"))
      .distinct()
      .join(edges.select(col("dst").as("nid")).distinct(), Seq("nid"), "left_anti")

  final case class UpstreamResult(
      nodeUpstream: DataFrame, // (nid, upstream_m)
      edgeFlow: DataFrame,     // (src, dst, len, flow_m) flow assigned at src
      rounds: Int)

  /** D5 — upstream accumulation over a DAG with equal flow splitting:
    *
    *   nodeUpstream(v) = Σ over in-edges e=(u,v) of (flow(e) + len(e))
    *   flow(e)         = nodeUpstream(u) / outdeg(u)
    *
    * (the reference's default rule when no `--flow-follows-tag` grouping
    * applies: inflow split equally over all out edges,
    * down/main.rs:875-884; sources start at 0).
    *
    * @param edges DataFrame(src: Long, dst: Long, len: Double), acyclic
    *              (run SCC contraction first).
    */
  def upstreamEqualSplit(
      edges: DataFrame,
      maxRounds: Int = 100000,
      checkpointer: Option[(Int, DataFrame) => DataFrame] = None): UpstreamResult = {
    val spark = edges.sparkSession

    val e0 = edges.select(
      col("src").cast("long"),
      col("dst").cast("long"),
      col("len").cast("double"))
    val outdeg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)

    // state carried across rounds, one row per node once resolved:
    //   resolved(nid, up)      — final upstream metres
    // and per still-unresolved node the partial inflow sum:
    //   acc(nid, acc)          — Σ of already-arrived in-contributions
    var live = e0.localCheckpoint(true) // edges whose source is unresolved
    var acc = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("nid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("acc",
          org.apache.spark.sql.types.DoubleType))))
    var resolved = spark.emptyDataFrame
      .withColumn("nid", lit(0L)).withColumn("up", lit(0.0)).limit(0)
    var flows = spark.emptyDataFrame
      .withColumn("src", lit(0L)).withColumn("dst", lit(0L))
      .withColumn("len", lit(0.0)).withColumn("flow_m", lit(0.0)).limit(0)

    var rounds = 0
    var doneCount = 0L
    val allNodes = e0.select(col("src").as("nid"))
      .union(e0.select(col("dst").as("nid"))).distinct().localCheckpoint(true)
    val totalNodes = allNodes.count()

    while (doneCount < totalNodes && rounds < maxRounds) {
      // ready = nodes with no remaining unresolved in-edge, not yet resolved
      val hasPendingIn = live.select(col("dst").as("nid")).distinct()
      val ready = allNodes
        .join(hasPendingIn, Seq("nid"), "left_anti")
        .join(resolved.select("nid"), Seq("nid"), "left_anti")
        .join(acc, Seq("nid"), "left")
        .select(col("nid"), coalesce(col("acc"), lit(0.0)).as("up"))
        .localCheckpoint(true)
      val nReady = ready.count()
      if (nReady == 0 && doneCount < totalNodes) {
        throw new IllegalStateException(
          s"upstream propagation stalled after $rounds rounds — graph has a cycle")
      }

      // contributions of ready nodes' out-edges
      val outs = live
        .join(ready.withColumnRenamed("nid", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("src"), col("dst"), col("len"),
          (col("up") / col("outdeg")).as("flow_m"))
      val outsCp = outs.localCheckpoint(true)

      acc = acc
        .union(outsCp.select(col("dst").as("nid"),
          (col("flow_m") + col("len")).as("acc")))
        .groupBy("nid").agg(sum("acc").as("acc"))
      resolved = resolved.union(ready.select(col("nid"), col("up")))
      flows = flows.union(outsCp)
      live = live.join(ready.withColumnRenamed("nid", "src"), Seq("src"), "left_anti")

      val persisted = checkpointer match {
        case Some(cp) => cp(rounds, resolved)
        case None     => resolved.localCheckpoint(true)
      }
      resolved = persisted
      acc = acc.localCheckpoint(true)
      flows = flows.localCheckpoint(true)
      live = live.localCheckpoint(true)

      doneCount += nReady
      rounds += 1
    }
    UpstreamResult(
      resolved.withColumnRenamed("up", "upstream_m"), flows, rounds)
  }
}
