package graft.core

/** Point-to-point line-of-sight over a single-band terrain raster.
  *
  * Behavioral reference: alg/los.cpp GDALIsLineOfSightVisible (:183-368):
  *  - both endpoints are pre-checked against terrain (z ≥ terrain), with
  *    the failing endpoint reported as the intersection;
  *  - coincident endpoints are trivially visible;
  *  - vertical / horizontal sight lines walk every cell inclusively with
  *    a linear z interpolation on the walked axis;
  *  - the general case walks the Bresenham integer line (:37-110 — the
  *    balance-update variant that steps the major axis every iteration)
  *    with z linearly interpolated on EUCLIDEAN distance ratio
  *    (sqrt((x−xA)²+(y−yA)²) / sqrt((xB−xA)²+(yB−yA)²), :337-351);
  *  - the first below-terrain cell in walk order is the reported terrain
  *    intersection; a clear path reports (−1, −1).
  *
  * Out-of-raster cells fail the elevation read in the reference (RasterIO
  * error ⇒ not above terrain); here callers pass in-bounds endpoints and
  * the walk stays on the segment, which is in-bounds by convexity.
  */
object Los {

  /** (visible, ix, iy): ix/iy = first terrain intersection or (−1, −1). */
  def isVisible(band: Array[Int], w: Int, h: Int,
                xA: Int, yA: Int, zA: Double,
                xB: Int, yB: Int, zB: Double): (Boolean, Int, Int) = {
    require(xA >= 0 && xA < w && yA >= 0 && yA < h &&
      xB >= 0 && xB < w && yB >= 0 && yB < h, "LOS endpoints must be in-raster")

    @inline def above(x: Int, y: Int, z: Double): Boolean = z >= band(y * w + x)
    @inline def lerp(a: Double, b: Double, t: Double): Double = a + t * (b - a)

    if (!above(xA, yA, zA)) return (false, xA, yA)
    if (!above(xB, yB, zB)) return (false, xB, yB)
    if (xA == xB && yA == yB) return (true, -1, -1)

    if (xA == xB) {
      // vertical: linear z on the y ratio
      val step = if (yB > yA) 1 else -1
      var y = yA
      while (y != yB + step) {
        val z = lerp(zA, zB, (y - yA).toDouble / (yB - yA).toDouble)
        if (!above(xA, y, z)) return (false, xA, y)
        y += step
      }
      return (true, -1, -1)
    }
    if (yA == yB) {
      val step = if (xB > xA) 1 else -1
      var x = xA
      while (x != xB + step) {
        val z = lerp(zA, zB, (x - xA).toDouble / (xB - xA).toDouble)
        if (!above(x, yA, z)) return (false, x, yA)
        x += step
      }
      return (true, -1, -1)
    }

    // Bresenham with sqrt-ratio z interpolation
    val rDen = {
      val dx = (xB - xA).toDouble; val dy = (yB - yA).toDouble
      dx * dx + dy * dy
    }
    @inline def check(x: Int, y: Int): Boolean = {
      val dx = (x - xA).toDouble; val dy = (y - yA).toDouble
      val z = lerp(zA, zB, math.sqrt((dx * dx + dy * dy) / rDen))
      above(x, y, z)
    }
    var dx = math.abs(xB - xA); val incx = if (xB >= xA) 1 else -1
    var dy = math.abs(yB - yA); val incy = if (yB >= yA) 1 else -1
    var x = xA; var y = yA
    if (dx >= dy) {
      dy <<= 1
      var balance = dy - dx
      dx <<= 1
      while (x != xB) {
        if (!check(x, y)) return (false, x, y)
        if (balance >= 0) { y += incy; balance -= dx }
        balance += dy
        x += incx
      }
      if (!check(x, y)) return (false, x, y)
    } else {
      dx <<= 1
      var balance = dx - dy
      dy <<= 1
      while (y != yB) {
        if (!check(x, y)) return (false, x, y)
        if (balance >= 0) { x += incx; balance -= dy }
        balance += dx
        y += incy
      }
      if (!check(x, y)) return (false, x, y)
    }
    (true, -1, -1)
  }
}
