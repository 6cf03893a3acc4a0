package graft.core

/** Point-in-polygon and box-overlap predicates.
  *
  * Even-odd ray casting, the same fill rule as the reference's scanline
  * rasterizer (alg/llrasterize.cpp GDALdllImageFilledPolygon) and its exact
  * spatial-filter refine step (ogrlayer.cpp:4004-4072): a cheap bbox test
  * first, exact test only on survivors. Holes are handled naturally by
  * even-odd parity across all rings.
  */
object Pip {
  /** Even-odd test of (px,py) against one ring (flat x0,y0,x1,y1,…). */
  def inRing(ring: Array[Double], px: Double, py: Double): Boolean = {
    var inside = false
    val n = ring.length / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if ((yi > py) != (yj > py)) {
        val xCross = xi + (py - yi) / (yj - yi) * (xj - xi)
        if (px < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  def inPolygon(poly: Wkb.Polygon, px: Double, py: Double): Boolean = {
    var parity = false
    var r = 0
    while (r < poly.rings.length) {
      if (inRing(poly.rings(r), px, py)) parity = !parity
      r += 1
    }
    parity
  }

  /** Exact PIP against any supported WKB geometry (polygon/multipolygon). */
  def contains(wkb: Array[Byte], px: Double, py: Double): Boolean = {
    val g = Wkb.read(wkb)
    var i = 0
    var parity = false
    while (i < g.polygons.length) {
      // even-odd across every ring of every part
      val p = g.polygons(i)
      var r = 0
      while (r < p.rings.length) {
        if (inRing(p.rings(r), px, py)) parity = !parity
        r += 1
      }
      i += 1
    }
    parity
  }

  @inline def bboxIntersects(aMinX: Double, aMinY: Double, aMaxX: Double, aMaxY: Double,
                             bMinX: Double, bMinY: Double, bMaxX: Double, bMaxY: Double): Boolean =
    aMinX <= bMaxX && aMaxX >= bMinX && aMinY <= bMaxY && aMaxY >= bMinY

  /** Segment-intersection + PIP based polygon×box intersects test — the
    * refine step for footprint(box)×polygon joins. Exact for convex and
    * concave rings (no curve segments exist in our corpus). */
  def polygonIntersectsBox(wkb: Array[Byte], minx: Double, miny: Double, maxx: Double, maxy: Double): Boolean = {
    val (gminx, gminy, gmaxx, gmaxy) = Wkb.envelope(wkb)
    if (!bboxIntersects(gminx, gminy, gmaxx, gmaxy, minx, miny, maxx, maxy)) return false
    // box corner inside polygon?
    if (contains(wkb, minx, miny) || contains(wkb, maxx, miny) ||
        contains(wkb, minx, maxy) || contains(wkb, maxx, maxy)) return true
    val g = Wkb.read(wkb)
    // polygon vertex inside box?
    var i = 0
    while (i < g.polygons.length) {
      val rings = g.polygons(i).rings
      var r = 0
      while (r < rings.length) {
        val ring = rings(r)
        var k = 0
        while (k < ring.length) {
          val x = ring(k); val y = ring(k + 1)
          if (x >= minx && x <= maxx && y >= miny && y <= maxy) return true
          k += 2
        }
        // any edge crossing a box edge?
        var e = 0
        val n = ring.length / 2
        while (e < n - 1) {
          val x1 = ring(2 * e); val y1 = ring(2 * e + 1)
          val x2 = ring(2 * e + 2); val y2 = ring(2 * e + 3)
          if (segIntersectsBox(x1, y1, x2, y2, minx, miny, maxx, maxy)) return true
          e += 1
        }
        r += 1
      }
      i += 1
    }
    false
  }

  private def segIntersectsBox(x1: Double, y1: Double, x2: Double, y2: Double,
                               minx: Double, miny: Double, maxx: Double, maxy: Double): Boolean = {
    // Liang–Barsky style clip test
    var t0 = 0.0; var t1 = 1.0
    val dx = x2 - x1; val dy = y2 - y1
    @inline def clip(p: Double, q: Double): Boolean = {
      if (p == 0.0) q >= 0
      else {
        val r = q / p
        if (p < 0) { if (r > t1) false else { if (r > t0) t0 = r; true } }
        else { if (r < t0) false else { if (r < t1) t1 = r; true } }
      }
    }
    clip(-dx, x1 - minx) && clip(dx, maxx - x1) && clip(-dy, y1 - miny) && clip(dy, maxy - y1)
  }
}
