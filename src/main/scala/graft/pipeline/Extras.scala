package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{ConnectedComponents, Local, LocalPaths}

/** Per-component optional outputs of the undirected engine: frames (P6),
  * betweenness (P8), and the directed longest source→mouth (D17).
  * Each distributes as `groupByKey(comp).flatMapGroups` over labelled
  * edges — components run in parallel, walks stay local.
  */
object Extras {

  private def labelled(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val labels = ConnectedComponents.run(edges.select("src", "dst")).labels
    edges
      .join(labels.withColumnRenamed("nid", "src"), Seq("src"))
      .join(nodes.select(col("nid").as("src"), col("lat").as("lat1"),
        col("lon").as("lon1")), Seq("src"))
      .join(nodes.select(col("nid").as("dst"), col("lat").as("lat2"),
        col("lon").as("lon2")), Seq("dst"))
  }

  /** P6 — frames per component: (comp, line: array<nid>). */
  def frames(edges: DataFrame, nodes: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    labelled(edges, nodes)
      .select("comp", "src", "dst", "lat1", "lon1", "lat2", "lon2")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (comp, rows) =>
        val es = rows.toSeq
        val pos: LocalPaths.Pos =
          (es.map(e => e._2 -> (e._4, e._5)) ++ es.map(e => e._3 -> (e._6, e._7))).toMap
        LocalPaths.frames(es.map(e => (e._2, e._3)), pos)
          .zipWithIndex.map { case (line, i) => (comp, i, line) }
      }
      .toDF("comp", "line_idx", "line")
  }

  /** P8 — betweenness per component:
    * (comp, src, dst, value, value_fraction_max) with the reference's
    * min-fraction cutoff semantics applied by the caller.
    */
  def betweenness(
      edges: DataFrame, nodes: DataFrame, spark: SparkSession,
      maxSamples: Int = 2000): DataFrame = {
    import spark.implicits._
    labelled(edges, nodes)
      .select("comp", "src", "dst", "lat1", "lon1", "lat2", "lon2")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (comp, rows) =>
        val es = rows.toSeq
        val pos: LocalPaths.Pos =
          (es.map(e => e._2 -> (e._4, e._5)) ++ es.map(e => e._3 -> (e._6, e._7))).toMap
        val b = LocalPaths.betweenness(es.map(e => (e._2, e._3)), pos, maxSamples)
        val maxV = if (b.isEmpty) 1.0 else math.max(b.values.max, 1e-12)
        b.toSeq.sortBy(_._1).map { case ((a, c), v) =>
          (comp, a, c, v, v / maxV)
        }
      }
      .toDF("comp", "src", "dst", "value", "value_fraction_max")
  }

  /** D17 — longest source→mouth per basin
    * (/root/reference/src/longest_source_mouth.rs:45-315): mouths = no-out
    * vertexes; per mouth, Dijkstra flood UPSTREAM (max over shortest-path
    * distances — the reference's exact behaviour, replicated not "fixed"),
    * take the max-distance source and rebuild the path.
    * @param edges (src, dst, len) DAG
    * @return (mouth, source, dist_m, path)
    */
  def longestSourceMouth(edges: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val weak = ConnectedComponents.run(edges.select("src", "dst")).labels
    edges
      .join(weak.withColumnRenamed("nid", "src"), Seq("src"))
      .select("comp", "src", "dst", "len")
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        val es = rows.toSeq
        val outs = es.map(e => (e._2, e._3)).toSet
        val mouths = es.map(_._3).distinct.filterNot(n => es.exists(_._2 == n))
        // reversed adjacency for the upstream flood
        val radj = es.groupBy(_._3).view
          .mapValues(_.map(e => (e._2, e._4)).sortBy(x => (x._2, x._1))).toMap
        mouths.sorted.iterator.map { mouth =>
          val (dist, parent) = Local.dijkstra(radj, mouth)
          val candidates = dist.filter { case (n, _) => !es.exists(_._3 == n) }
          if (candidates.isEmpty) (mouth, mouth, 0.0, Seq(mouth))
          else {
            val (source, d) = candidates.maxBy { case (n, dd) => (dd, -n) }
            val path = Local.pathTo(parent, mouth, source)
              .map(_.reverse).getOrElse(Seq(source, mouth))
            (mouth, source, d, path)
          }
        }
      }
      .toDF("mouth", "source", "dist_m", "path")
  }
}
