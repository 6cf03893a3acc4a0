package graft.core

/** Geolocation-array transformer: a raster georeferenced by per-cell
  * lon/lat arrays (typically subsampled by PIXEL_STEP/LINE_STEP) instead
  * of an affine geotransform or GCPs.
  *
  * Behavioral reference: alg/gdalgeoloc.cpp —
  *  - forward (GDALGeoLoc::Transform !bDstToSrc, :611-648): raster
  *    (pixel,line) → geoloc-array coords via (p − PIXEL_OFFSET)/PIXEL_STEP
  *    (− 0.5 when the arrays are center-of-pixel referenced), then
  *    bilinear interpolation PixelLineToXY (:391-527) with the
  *    closest-grid-square infinite extension beyond borders (right/bottom
  *    edge retreat retries, 1-D edge fallbacks, corner fallback);
  *  - inverse (:795-940): locate a geolocation cell whose forward quad
  *    contains the geo point, then the exact inverse bilinear solve
  *    GDALInverseBilinearInterpolation (:952-1009 — quadratic in the line
  *    fraction s with the degenerate-parallelogram branch s = A/(A−C)),
  *    mapped back through the offset/step convention.
  *
  * Scope: no nodata holes and no antimeridian wrap (ShiftGeoX is the
  * identity) — the fixture corpora are continuous local grids. The
  * reference seeds its inverse from a precomputed backmap raster or
  * quadtree (:657, GenerateBackMap) and ring-searches up to radius 3;
  * this port scans bbox-prefiltered cells directly — identical accepted
  * set on non-degenerate grids — and caps the grid size accordingly
  * (production-scale inverse would precompute the backmap as its own
  * distributed job). The geoloc arrays are driver-held and broadcast,
  * like the reference's in-memory accessors: they are O(raster/step²),
  * not O(corpus).
  */
final case class GeoLoc(xArr: Array[Double], yArr: Array[Double],
                        gw: Int, gh: Int,
                        pixelOffset: Double, lineOffset: Double,
                        pixelStep: Double, lineStep: Double,
                        originTopLeftCorner: Boolean = true) {
  require(xArr.length == gw * gh && yArr.length == gw * gh, "geoloc array shape")
  require(gw.toLong * gh <= 4_000_000L,
    "GeoLoc: grid too large for the driver-held inverse scan — precompute a backmap")

  private val conv = if (originTopLeftCorner) 0.0 else 0.5

  @inline private def gx(i: Int, j: Int): Double = xArr(j * gw + i)
  @inline private def gy(i: Int, j: Int): Double = yArr(j * gw + i)

  /** Bilinear interpolation in geoloc-array coordinates, mirroring the
    * reference's edge-retreat/1-D-fallback structure. */
  def pixelLineToXY(gp: Double, gl: Double): (Double, Double) = {
    var iX = math.min(math.max(0.0, gp), (gw - 1).toDouble).toInt
    var iY = math.min(math.max(0.0, gl), (gh - 1).toDouble).toInt
    var attempt = 0
    while (attempt < 2) {
      val x00 = gx(iX, iY); val y00 = gy(iX, iY)
      if (iX + 1 < gw && iY + 1 < gh) {
        val fx = gp - iX; val fy = gl - iY
        val x = (1 - fy) * (x00 + fx * (gx(iX + 1, iY) - x00)) +
          fy * (gx(iX, iY + 1) + fx * (gx(iX + 1, iY + 1) - gx(iX, iY + 1)))
        val y = (1 - fy) * (y00 + fx * (gy(iX + 1, iY) - y00)) +
          fy * (gy(iX, iY + 1) + fx * (gy(iX + 1, iY + 1) - gy(iX, iY + 1)))
        return (x, y)
      }
      if (iX == gw - 1 && iX >= 1 && iY + 1 < gh) { iX -= 1; attempt += 1 }
      else if (iY == gh - 1 && iY >= 1 && iX + 1 < gw) { iY -= 1; attempt += 1 }
      else if (iX == gw - 1 && iY == gh - 1 && iX >= 1 && iY >= 1) { iX -= 1; iY -= 1; attempt += 1 }
      else if (iX + 1 < gw) {
        val fx = gp - iX
        return (x00 + fx * (gx(iX + 1, iY) - x00), y00 + fx * (gy(iX + 1, iY) - y00))
      } else if (iY + 1 < gh) {
        val fy = gl - iY
        return (x00 + fy * (gx(iX, iY + 1) - x00), y00 + fy * (gy(iX, iY + 1) - y00))
      } else {
        return (x00, y00)
      }
    }
    // unreachable: each retreat lands on a full bilinear cell
    (gx(iX, iY), gy(iX, iY))
  }

  /** Raster (pixel, line) → (geoX, geoY). */
  def forward(p: Double, l: Double): (Double, Double) =
    pixelLineToXY((p - pixelOffset) / pixelStep - conv,
      (l - lineOffset) / lineStep - conv)

  /** Exact inverse bilinear solve inside one cell: returns the cell-local
    * (i+t, j+s) given quad corners in the reference's (x0,y0)=(i,j),
    * (x1,y1)=(i,j+1), (x2,y2)=(i+1,j), (x3,y3)=(i+1,j+1) layout. */
  private def inverseBilinear(x: Double, y: Double,
                              x0: Double, y0: Double, x1: Double, y1: Double,
                              x2: Double, y2: Double, x3: Double, y3: Double): (Double, Double) = {
    val a = (x0 - x) * (y0 - y2) - (y0 - y) * (x0 - x2)
    val b = (((x0 - x) * (y1 - y3) - (y0 - y) * (x1 - x3)) +
      ((x1 - x) * (y0 - y2) - (y1 - y) * (x0 - x2))) / 2
    val c = (x1 - x) * (y1 - y3) - (y1 - y) * (x1 - x3)
    val denom = a - 2 * b + c
    val mag = math.abs(a) + math.abs(b) + math.abs(c)
    val s =
      if (math.abs(denom) <= 1e-12 * mag) a / (a - c)
      else {
        val sq = math.sqrt(b * b - a * c)
        val s1 = ((a - b) + sq) / denom
        if (s1 < 0 || s1 > 1) ((a - b) - sq) / denom else s1
      }
    val tDenX = (1 - s) * (x0 - x2) + s * (x1 - x3)
    val t =
      if (math.abs(tDenX) > 1e-12 * mag) ((1 - s) * (x0 - x) + s * (x1 - x)) / tDenX
      else {
        val tDenY = (1 - s) * (y0 - y2) + s * (y1 - y3)
        if (math.abs(tDenY) > 1e-12 * mag) ((1 - s) * (y0 - y) + s * (y1 - y)) / tDenY
        else 0.0
      }
    (t, s)
  }

  /** (geoX, geoY) → raster (pixel, line), or None when no geolocation
    * cell's forward image contains the point. */
  def inverse(x: Double, y: Double): Option[(Double, Double)] = {
    val slack = 1e-9
    var j = 0
    while (j < gh - 1) {
      var i = 0
      while (i < gw - 1) {
        val x0 = gx(i, j); val y0 = gy(i, j)
        val x1 = gx(i, j + 1); val y1 = gy(i, j + 1)
        val x2 = gx(i + 1, j); val y2 = gy(i + 1, j)
        val x3 = gx(i + 1, j + 1); val y3 = gy(i + 1, j + 1)
        val minX = math.min(math.min(x0, x1), math.min(x2, x3))
        val maxX = math.max(math.max(x0, x1), math.max(x2, x3))
        val minY = math.min(math.min(y0, y1), math.min(y2, y3))
        val maxY = math.max(math.max(y0, y1), math.max(y2, y3))
        val eps = slack * (1.0 + math.max(maxX - minX, maxY - minY))
        if (x >= minX - eps && x <= maxX + eps && y >= minY - eps && y <= maxY + eps) {
          val (t, s) = inverseBilinear(x, y, x0, y0, x1, y1, x2, y2, x3, y3)
          if (t >= -slack && t <= 1 + slack && s >= -slack && s <= 1 + slack) {
            // confirm by forward evaluation (replaces the reference's
            // point-in-ring acceptance; identical away from boundary ties)
            val (fx, fy) = pixelLineToXY(i + t, j + s)
            val tol = 1e-9 * (1.0 + math.abs(x) + math.abs(y))
            if (math.abs(fx - x) <= tol && math.abs(fy - y) <= tol) {
              return Some(((i + t + conv) * pixelStep + pixelOffset,
                (j + s + conv) * lineStep + lineOffset))
            }
          }
        }
        i += 1
      }
      j += 1
    }
    None
  }
}
