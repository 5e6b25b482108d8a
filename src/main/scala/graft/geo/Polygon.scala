package graft.geo

/** Point-in-polygon via even-odd ray casting (SURVEY.md §4.3 — cell
  * prefilter + exact test; our stand-in for the reference's
  * country-boundaries grid lookup,
  * /root/reference/src/bin/osm-lump-ways-down/main.rs:573-599).
  *
  * Edge semantics are the standard half-open crossing rule: an edge
  * counts iff it spans the point's latitude as [y_i, y_j) and the
  * crossing lies strictly east of the point — on an axis-aligned box this
  * reduces to [latmin, latmax) × [lonmin, lonmax), which the SQL oracles
  * replicate exactly.
  */
object Polygon {

  /** ring: closed or open sequence of (lat, lon) vertexes. */
  def contains(ring: IndexedSeq[(Double, Double)], lat: Double, lon: Double): Boolean = {
    val n = if (ring.length > 1 && ring.head == ring.last) ring.length - 1 else ring.length
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val (yi, xi) = ring(i)
      val (yj, xj) = ring(j)
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Bounding box (latMin, latMax, lonMin, lonMax). */
  def bbox(ring: Seq[(Double, Double)]): (Double, Double, Double, Double) =
    (ring.map(_._1).min, ring.map(_._1).max, ring.map(_._2).min, ring.map(_._2).max)

  /** All cells at `res` overlapping the polygon's bbox — the coarse
    * covering used as the broadcast join key. (A tighter covering that
    * tests cell-rectangle/polygon overlap is a later optimisation; bbox
    * cover is correct, just looser.)
    */
  def coverCells(ring: Seq[(Double, Double)], res: Int): Seq[Long] = {
    val (latMin, latMax, lonMin, lonMax) = bbox(ring)
    val x0 = CellIndex.xOf(lonMin, res)
    val x1 = CellIndex.xOf(math.nextDown(lonMax), res)
    val y0 = CellIndex.yOf(latMin, res)
    val y1 = CellIndex.yOf(math.nextDown(latMax), res)
    for {
      y <- y0 to y1
      x <- x0 to x1
    } yield CellIndex.pack(x, y, res)
  }
}
