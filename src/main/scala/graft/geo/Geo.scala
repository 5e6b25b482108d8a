package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic + rounding primitives.
  *
  * Haversine matches the reference's great-circle distance
  * (/root/reference/src/haversine.rs:6-18, geo crate, mean Earth radius).
  * Implemented as a pure Catalyst column expression tree — codegen'd,
  * no UDF in the hot path.
  */
object Geo {

  /** Mean Earth radius in metres (geo crate 0.33 / IUGG). */
  val EarthRadiusM: Double = 6371008.8

  /** Haversine distance in metres between two (lat, lon) degree pairs.
    * Pure column expression (whole-stage-codegen friendly).
    */
  def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
    lit(2.0 * EarthRadiusM) * asin(sqrt(a))
  }

  /** Scala-side haversine for the per-component local algorithms. */
  def haversineM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2.0
    val dLon = math.toRadians(lon2 - lon1) / 2.0
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon) * math.sin(dLon)
    2.0 * EarthRadiusM * math.asin(math.sqrt(a))
  }

  /** Round half-away-from-zero to `p` decimal places — matches the
    * reference's `round(f, p)` (/root/reference/src/utils.rs:8-11, Rust
    * `f64::round` semantics). Spark's `bround` is half-even; `round` is
    * HALF_UP on the positive axis which equals half-away-from-zero for
    * our non-negative lengths, but we keep an explicit form for clarity.
    */
  def roundHalfAway(c: Column, p: Int): Column = {
    val m = math.pow(10, p)
    signum(c) * floor(abs(c) * m + 0.5) / m
  }

  /** Scala-side half-away-from-zero rounding. */
  def roundHalfAway(x: Double, p: Int): Double = {
    val m = math.pow(10, p)
    math.signum(x) * math.floor(math.abs(x) * m + 0.5) / m
  }

  /** Round to the nearest multiple of `mult`
    * (/root/reference/src/utils.rs:15-17).
    */
  def roundMult(c: Column, mult: Double): Column =
    signum(c) * floor(abs(c) / mult + 0.5) * mult

  def roundMult(x: Double, mult: Double): Double =
    math.signum(x) * math.floor(math.abs(x) / mult + 0.5) * mult
}
