package graft.core

/** Focal/neighborhood raster operators (SURVEY.md §2.5): 3×3 convolution
  * and the DEM derivative family — slope, aspect, hillshade, roughness,
  * TPI, TRI — with Horn's 3×3 gradient stencil, the classic published
  * formulas the reference's per-op apps implement
  * (apps/gdalalg_raster_slope.cpp, …_hillshade.cpp, …_aspect.cpp,
  * …_roughness.cpp, …_tpi.cpp, …_tri.cpp — behavior only, no code reuse).
  * Edge pixels use clamped (edge-replicated) neighbors.
  *
  * Kernels stay WITHIN one image row of the corpus, so the distributed
  * form is a per-row expression — no halo exchange (SURVEY §2.5 note).
  */
object Focal {
  @inline private def at(b: Array[Int], w: Int, h: Int, x: Int, y: Int): Double = {
    val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
    val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
    b(cy * w + cx).toDouble
  }

  /** Horn gradient at (x,y): (dz/dx, dz/dy) given cell resolutions. */
  @inline private def horn(b: Array[Int], w: Int, h: Int, x: Int, y: Int,
                           ewRes: Double, nsRes: Double): (Double, Double) = {
    val a = at(b, w, h, x - 1, y - 1); val bb = at(b, w, h, x, y - 1); val c = at(b, w, h, x + 1, y - 1)
    val d = at(b, w, h, x - 1, y);                                     val f = at(b, w, h, x + 1, y)
    val g = at(b, w, h, x - 1, y + 1); val hh = at(b, w, h, x, y + 1); val i = at(b, w, h, x + 1, y + 1)
    val dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * ewRes)
    val dzdy = ((g + 2 * hh + i) - (a + 2 * bb + c)) / (8.0 * nsRes)
    (dzdx, dzdy)
  }

  /** Slope in degrees (Horn), zFactor-scaled. */
  def slope(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double, zFactor: Double = 1.0): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dy) = horn(b, w, h, x, y, ewRes, nsRes)
        out(y * w + x) = math.toDegrees(math.atan(zFactor * math.hypot(dx, dy)))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Aspect in degrees clockwise from north (flat → -9999 like the
    * conventional nodata marker). */
  def aspect(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dy) = horn(b, w, h, x, y, ewRes, nsRes)
        out(y * w + x) =
          if (dx == 0.0 && dy == 0.0) -9999.0
          else {
            val az = math.toDegrees(math.atan2(dy, -dx)) // math angle → compass below
            val compass = 90.0 - az
            if (compass < 0) compass + 360.0 else if (compass >= 360.0) compass - 360.0 else compass
          }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Hillshade 0..255 (Horn gradients; default sun az=315°, alt=45°). */
  def hillshade(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double,
                azimuthDeg: Double = 315.0, altitudeDeg: Double = 45.0, zFactor: Double = 1.0): Array[Int] = {
    // cang = n̂·ŝ with n ∝ (−dz/dE, −dz/dN, 1) and sun vector from
    // (azimuth clockwise-from-north, altitude); image rows grow SOUTH so
    // dz/dN = −dz/dy_img
    val azRad = math.toRadians(azimuthDeg)
    val alt = math.toRadians(altitudeDeg)
    val sinAlt = math.sin(alt)
    val cosAlt = math.cos(alt)
    val sinAz = math.sin(azRad)
    val cosAz = math.cos(azRad)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dyImg) = horn(b, w, h, x, y, ewRes, nsRes)
        val dzdE = zFactor * dx
        val dzdN = -zFactor * dyImg
        val cang = (sinAlt - cosAlt * (dzdE * sinAz + dzdN * cosAz)) /
          math.sqrt(1.0 + dzdE * dzdE + dzdN * dzdN)
        out(y * w + x) = math.max(0, math.min(255, math.round(254.0 * cang + 1.0).toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Roughness: max − min of the 3×3 neighborhood. */
  def roughness(b: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var mn = Double.MaxValue; var mx = -Double.MaxValue
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = at(b, w, h, x + dx, y + dy)
            if (v < mn) mn = v
            if (v > mx) mx = v
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = (mx - mn).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** TPI: center − mean(8 neighbors). */
  def tpi(b: Array[Int], w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var sum = 0.0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            if (dx != 0 || dy != 0) sum += at(b, w, h, x + dx, y + dy)
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = at(b, w, h, x, y) - sum / 8.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** TRI: mean |center − neighbor| over the 8 neighbors. */
  def tri(b: Array[Int], w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = at(b, w, h, x, y)
        var sum = 0.0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            if (dx != 0 || dy != 0) sum += math.abs(c - at(b, w, h, x + dx, y + dy))
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = sum / 8.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Generic 3×3 weighted convolution (VRTKernelFilteredSource analog),
    * clamped-edge, optional normalization by the weight sum. */
  def convolve3x3(b: Array[Int], w: Int, h: Int, k: Array[Double], normalize: Boolean): Array[Double] = {
    require(k.length == 9, "3x3 kernel needs 9 weights")
    val norm = if (normalize && k.sum != 0.0) k.sum else 1.0
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var i = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            acc += k(i) * at(b, w, h, x + dx, y + dy)
            i += 1
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = acc / norm
        x += 1
      }
      y += 1
    }
    out
  }
}
