package graft.core

/** Vector→raster burn-in (the reference's gdal_rasterize core,
  * alg/gdalrasterize.cpp GDALRasterizeGeometries + even-odd scanline fill
  * per alg/llrasterize.cpp GDALdllImageFilledPolygon — semantics only,
  * re-implemented from the classic published scanline-fill algorithm).
  *
  * A pixel is burned iff its center (x+0.5, y+0.5) is inside the polygon
  * under the even-odd rule — identical to Pip, which keeps rasterize,
  * zonal-stats weighting and the PIP join mutually consistent.
  * MERGE_ALG: Replace overwrites, Add accumulates (gdalrasterize.cpp:796-834).
  */
object Rasterize {
  sealed trait MergeAlg
  case object Replace extends MergeAlg
  case object Add extends MergeAlg

  /** Burn one WKB polygon/multipolygon into `grid` (row-major w×h ints).
    * `gt` maps pixel→geo; geometry is in the same CRS as gt. */
  def burn(grid: Array[Int], w: Int, h: Int, gt: Array[Double], wkb: Array[Byte],
           value: Int, merge: MergeAlg = Replace): Unit = {
    val inv = GeoTransform.invert(gt).getOrElse(return)
    val g = Wkb.read(wkb)
    // project all rings to pixel space once
    val rings = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    g.polygons.foreach { poly =>
      poly.rings.foreach { ring =>
        val px = new Array[Double](ring.length)
        var i = 0
        while (i < ring.length) {
          px(i) = GeoTransform.applyX(inv, ring(i), ring(i + 1))
          px(i + 1) = GeoTransform.applyY(inv, ring(i), ring(i + 1))
          i += 2
        }
        rings += px
      }
    }
    if (rings.isEmpty) return
    var minY = Double.MaxValue
    var maxY = -Double.MaxValue
    rings.foreach { r =>
      var i = 1
      while (i < r.length) {
        if (r(i) < minY) minY = r(i)
        if (r(i) > maxY) maxY = r(i)
        i += 2
      }
    }
    val y0 = math.max(0, math.floor(minY - 0.5).toInt)
    val y1 = math.min(h - 1, math.ceil(maxY).toInt)
    val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
    var y = y0
    while (y <= y1) {
      val cy = y + 0.5
      xs.clear()
      rings.foreach { r =>
        val n = r.length / 2
        var i = 0
        var j = n - 1
        while (i < n) {
          val xi = r(2 * i); val yi = r(2 * i + 1)
          val xj = r(2 * j); val yj = r(2 * j + 1)
          if ((yi > cy) != (yj > cy))
            xs += xi + (cy - yi) / (yj - yi) * (xj - xi)
          j = i
          i += 1
        }
      }
      val sorted = xs.toArray
      java.util.Arrays.sort(sorted)
      var k = 0
      while (k + 1 < sorted.length) {
        // fill pixels whose center x+0.5 ∈ [xa, xb)
        var x = math.max(0, math.ceil(sorted(k) - 0.5).toInt)
        val xEnd = math.min(w - 1, math.ceil(sorted(k + 1) - 0.5).toInt - 1)
        while (x <= xEnd) {
          val idx = y * w + x
          merge match {
            case Replace => grid(idx) = value
            case Add => grid(idx) += value
          }
          x += 1
        }
        k += 2
      }
      y += 1
    }
  }

  /** Rasterize many (wkb, value) pairs into a fresh grid. */
  def rasterize(w: Int, h: Int, gt: Array[Double], shapes: Seq[(Array[Byte], Int)],
                init: Int = 0, merge: MergeAlg = Replace): Array[Int] = {
    val grid = Array.fill(w * h)(init)
    shapes.foreach { case (wkb, v) => burn(grid, w, h, gt, wkb, v, merge) }
    grid
  }
}
