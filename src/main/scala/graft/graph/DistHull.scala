package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed per-component convex hull — the mergeable-aggregate form
  * of [[Local.convexHull]] (P10): the hull is an associative aggregate
  * (hull(S) = hull(hull(S₁) ∪ hull(S₂)); every strict extreme point of S
  * is a strict extreme point of any subset containing it, and a point
  * inside a partial hull's segment is inside the global one), so it
  * two-levels like any partial aggregation: bucketed partial hulls —
  * O(|verts|/buckets) per task — then one merge per component over the
  * few surviving points. Replaces the O(component) single-task hull that
  * the frames scale path would otherwise need.
  */
object DistHull {

  /** @param verts (comp, nid, lat, lon), distinct per (comp, nid)
    * @param buckets partial-hull fan-out per component
    * @return (comp, nid, lat, lon): one row per hull VERTEX position,
    *         nid = the least nid at that exact position — the same pick
    *         as LocalPaths.frames' byPoint mapping
    */
  def hullNids(
      verts: DataFrame, spark: SparkSession, buckets: Int = 256): DataFrame = {
    import spark.implicits._
    val v = verts.select(col("comp").cast("long"), col("nid").cast("long"),
      col("lat").cast("double"), col("lon").cast("double"))
      .localCheckpoint(true)

    val partial = v
      .withColumn("bucket", pmod(xxhash64(col("nid")), lit(buckets)))
      .as[(Long, Long, Double, Double, Long)]
      .groupByKey(r => (r._1, r._5))
      .flatMapGroups { (key, rows) =>
        val pts = rows.map(r => (r._3, r._4)).toSeq
        Local.convexHull(pts).iterator.map(p => (key._1, p._1, p._2))
      }
      .toDF("comp", "lat", "lon")

    // merge: a component's candidate set is the union of its partial
    // hulls — tiny for real geometry; adversarial all-on-a-circle inputs
    // hit the loud cap instead of grinding into OOM
    val hullPts = partial
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (comp, rows) =>
        val pts = Local.boundedSeq(rows, s"P10 hull merge (component $comp)")
          .map(r => (r._2, r._3))
        Local.convexHull(pts).iterator.map(p => (comp, p._1, p._2))
      }
      .toDF("comp", "lat", "lon")

    v.join(hullPts, Seq("comp", "lat", "lon"))
      .groupBy("comp", "lat", "lon")
      .agg(min("nid").as("nid"))
      .select("comp", "nid", "lat", "lon")
  }
}
