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

  /** Slope as a percentage (apps/gdaldem_lib.cpp:1390 GDALSlopeHornAlg
    * slopeFormat 0, the `-p` mode): 100·z·√(dx²+dy²) over the Horn
    * gradients. Deliberately spelled sqrt((dx·dx)+(dy·dy)) — NOT
    * Math.hypot — so every step is a single correctly-rounded IEEE op
    * and the value reproduces bit-for-bit in any IEEE-double engine
    * (hypot's extra-precision path drifts ulps from the reference's own
    * sqrt form). */
  def slopePercent(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double,
                   zFactor: Double = 1.0): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dy) = horn(b, w, h, x, y, ewRes, nsRes)
        out(y * w + x) = 100.0 * (zFactor * math.sqrt((dx * dx) + (dy * dy)))
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
        // the reference floors shadowed pixels at 1 (0 is reserved for
        // nodata): GDALHillshadeAlg cang_mul_254 <= 0 → 1 else 1 + it
        val c254 = 254.0 * cang
        val f = if (c254 <= 0.0) 1.0 else 1.0 + c254
        out(y * w + x) = math.min(255, math.round(f).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Hillshade `-combined` (apps/gdaldem_lib.cpp:1151
    * GDALHillshadeCombinedAlg, behavioral spec): the standard shade's
    * angle acos(cang) damped by slope steepness —
    * shade = 1 − acos(cang)·atan(√slope)·4/π², output 1 + 254·shade with
    * the reference's ≤0 → 1 floor. Same Horn gradients and sun defaults
    * as [[hillshade]]; double math (the reference computes in float,
    * an implementation detail of the same formula). */
  def hillshadeCombined(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double,
                        azimuthDeg: Double = 315.0, altitudeDeg: Double = 45.0,
                        zFactor: Double = 1.0): Array[Int] = {
    val azRad = math.toRadians(azimuthDeg)
    val alt = math.toRadians(altitudeDeg)
    val sinAlt = math.sin(alt); val cosAlt = math.cos(alt)
    val sinAz = math.sin(azRad); val cosAz = math.cos(azRad)
    val invSqHalfPi = 4.0 / (math.Pi * math.Pi)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dyImg) = horn(b, w, h, x, y, ewRes, nsRes)
        val dzdE = zFactor * dx
        val dzdN = -zFactor * dyImg
        val s = dzdE * dzdE + dzdN * dzdN
        val num = sinAlt - cosAlt * (dzdE * sinAz + dzdN * cosAz)
        val cang = 1.0 - math.acos(num / math.sqrt(1.0 + s)) * math.atan(math.sqrt(s)) * invSqHalfPi
        val f = if (cang <= 0.0) 1.0 else 1.0 + 254.0 * cang
        out(y * w + x) = math.max(0, math.min(255, math.round(f).toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Hillshade `-multidirectional` (apps/gdaldem_lib.cpp:1257
    * GDALHillshadeMultiDirectionalAlg / USGS OF 92-422): shade from sun
    * azimuths 225/270/315/360° at the given altitude, each floored at 0,
    * blended by the aspect weights W_az = sin²(aspect − az) (expressed in
    * closed form on the gradient), normalized by Σweights = 2·(X²+Y²) via
    * the reference's ·127 halving, then divided by the slope norm. Flat
    * pixels take the exact 1 + 254·sin(alt) branch. */
  def hillshadeMultiDirectional(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double,
                                altitudeDeg: Double = 45.0, zFactor: Double = 1.0): Array[Int] = {
    val alt = math.toRadians(altitudeDeg)
    val sinAlt = math.sin(alt); val cosAlt = math.cos(alt)
    val cos225 = math.cos(math.toRadians(225.0))
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dyImg) = horn(b, w, h, x, y, ewRes, nsRes)
        // the reference's (x, y) gradients scaled by z/8 (gt5 < 0 flips
        // both signs vs the image-space horn outputs; weights/vals are
        // invariant to the common factor, the slope norm uses this form)
        val gx = -zFactor * dx
        val gy = -zFactor * dyImg
        val s = gx * gx + gy * gy
        val f =
          if (s == 0.0) 1.0 + 254.0 * sinAlt
          else {
            @inline def pos(v: Double): Double = if (v <= 0.0) 0.0 else v
            val v225 = pos(127.0 * (sinAlt + (gx - gy) * cos225 * cosAlt))
            val v270 = pos(127.0 * (sinAlt - gx * cosAlt))
            val v315 = pos(127.0 * (sinAlt + (gx + gy) * cos225 * cosAlt))
            val v360 = pos(127.0 * (sinAlt - gy * cosAlt))
            val w225 = 0.5 * s - gx * gy
            val w315 = s - w225
            val num = (w225 * v225 + gx * gx * v270 + w315 * v315 + gy * gy * v360) / s
            1.0 + num / math.sqrt(1.0 + s)
          }
        out(y * w + x) = math.max(0, math.min(255, math.round(f).toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Zevenbergen–Thorne central-difference gradient (apps/gdaldem_lib.cpp:798
    * Gradient<ZEVENBERGEN_THORNE>, reference's `-alg ZevenbergenThorne`):
    * x = (west − east)/ewres, y = (south − north)/gt5 with gt5 = −nsRes,
    * z-factor z/2 applied by the callers. */
  @inline private def ztGrad(b: Array[Int], w: Int, h: Int, x: Int, y: Int,
                             ewRes: Double, nsRes: Double): (Double, Double) = {
    val gx = (at(b, w, h, x - 1, y) - at(b, w, h, x + 1, y)) / ewRes
    val gy = (at(b, w, h, x, y + 1) - at(b, w, h, x, y - 1)) / (-nsRes)
    (gx, gy)
  }

  /** Slope in degrees, Zevenbergen–Thorne gradient
    * (apps/gdaldem_lib.cpp:1390 GDALSlopeZevenbergenThorneAlg):
    * atan(0.5·√(dx²+dy²)) in degrees. */
  def slopeZT(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (gx, gy) = ztGrad(b, w, h, x, y, ewRes, nsRes)
        out(y * w + x) = math.atan(math.sqrt(gx * gx + gy * gy) * 0.5) * 180.0 / math.Pi
        x += 1
      }
      y += 1
    }
    out
  }

  /** Aspect as compass azimuth, Zevenbergen–Thorne gradient
    * (apps/gdaldem_lib.cpp GDALAspectZevenbergenThorneAlg): the raw
    * central differences (no res scaling — atan2 is scale-invariant),
    * flat → −9999, azimuth fold 450−a / 90−a, 360 → 0. */
  def aspectZT(b: Array[Int], w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val dx = at(b, w, h, x + 1, y) - at(b, w, h, x - 1, y)
        val dy = at(b, w, h, x, y + 1) - at(b, w, h, x, y - 1)
        var a = math.atan2(dy, -dx) * 180.0 / math.Pi
        if (dx == 0.0 && dy == 0.0) a = -9999.0
        else a = if (a > 90.0) 450.0 - a else 90.0 - a
        if (a == 360.0) a = 0.0
        out(y * w + x) = a
        x += 1
      }
      y += 1
    }
    out
  }

  /** Hillshade with the Zevenbergen–Thorne gradient (the reference's
    * GDALHillshadeAlg with GradientAlg::ZEVENBERGEN_THORNE; z-factor z/2)
    * — same shading equation and shadow floor as [[hillshade]]. */
  def hillshadeZT(b: Array[Int], w: Int, h: Int, ewRes: Double, nsRes: Double,
                  azimuthDeg: Double = 315.0, altitudeDeg: Double = 45.0,
                  zFactor: Double = 1.0): Array[Int] = {
    val azRad = math.toRadians(azimuthDeg)
    val alt = math.toRadians(altitudeDeg)
    val sinAlt = math.sin(alt); val cosAlt = math.cos(alt)
    val sinAz = math.sin(azRad); val cosAz = math.cos(azRad)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (gx, gy) = ztGrad(b, w, h, x, y, ewRes, nsRes)
        val gX = 0.5 * zFactor * gx
        val gY = 0.5 * zFactor * gy
        val cang = (sinAlt - (gY * (cosAz * cosAlt) - gX * (sinAz * cosAlt))) /
          math.sqrt(1.0 + (gX * gX + gY * gY))
        val c254 = 254.0 * cang
        val f = if (c254 <= 0.0) 1.0 else 1.0 + c254
        out(y * w + x) = math.min(255, math.round(f).toInt)
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

  /** TRI, Riley variant (apps/gdaldem_lib.cpp:2332 GDALTRIAlgRiley —
    * the reference's DEFAULT TRI since 3.3): sqrt of the sum of squared
    * center−neighbor differences. Double math end-to-end (the reference
    * narrows to float on return); with integer bands the radicand is an
    * exact int so IEEE-correctly-rounded sqrt makes the plane
    * reproducible bit-for-bit in any IEEE-double engine. */
  def triRiley(b: Array[Int], w: Int, h: Int): Array[Double] = {
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
            if (dx != 0 || dy != 0) {
              val d = c - at(b, w, h, x + dx, y + dy)
              sum += d * d
            }
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = math.sqrt(sum)
        x += 1
      }
      y += 1
    }
    out
  }

  /** TRI, Wilson variant (apps/gdaldem_lib.cpp:2317 GDALTRIAlgWilson —
    * `-alg Wilson`, bathymetric use): mean |center − neighbor| over the 8
    * neighbors. */
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

  /** Color-relief selection modes (apps/gdaldem_lib.cpp ColorSelectionMode;
    * behavior only — the reference precomputes a LUT for integer bands,
    * which is an optimization of the same per-value function). */
  val ReliefInterpolate = 0
  val ReliefNearest = 1
  val ReliefExact = 2

  /** One color-relief lookup (apps/gdaldem_lib.cpp:1639
    * GDALColorReliefGetRGBA, behavioral spec): `ramp` is a flattened,
    * ascending-by-elevation (elev, r, g, b, a) table (stride 5, no NaN
    * entries — this engine has no nodata-NaN band path). Returns packed
    * 0xAARRGGBB. Semantics: clamp below/above the ramp ends; an exact
    * elevation match returns that entry; EXACT mode returns transparent
    * black for any non-match; NEAREST picks the closer bracketing entry
    * (ties to the upper, the reference's strict `<`); INTERPOLATE blends
    * each channel as trunc(0.5 + lo + ratio·(hi − lo)) clamped to 0..255
    * (the reference's `static_cast<int>` truncation). */
  def reliefColor(ramp: Array[Double], v: Double, mode: Int): Int = {
    val n = ramp.length / 5
    // first entry index with elevation >= v (lower bound)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ramp(mid * 5) >= v) hi = mid else lo = mid + 1
    }
    val i = lo
    @inline def pack(e: Int): Int = {
      val r = ramp(e * 5 + 1).toInt; val g = ramp(e * 5 + 2).toInt
      val b = ramp(e * 5 + 3).toInt; val a = ramp(e * 5 + 4).toInt
      (a << 24) | (r << 16) | (g << 8) | b
    }
    if (i == 0) {
      if (mode == ReliefExact && ramp(0) != v) 0 else pack(0)
    } else if (i == n) {
      if (mode == ReliefExact && ramp((n - 1) * 5) != v) 0 else pack(n - 1)
    } else if (ramp((i - 1) * 5) == v) pack(i - 1)
    else if (ramp(i * 5) == v) pack(i)
    else if (mode == ReliefExact) 0
    else if (mode == ReliefNearest) {
      if (v - ramp((i - 1) * 5) < ramp(i * 5) - v) pack(i - 1) else pack(i)
    } else {
      val ratio = (v - ramp((i - 1) * 5)) / (ramp(i * 5) - ramp((i - 1) * 5))
      @inline def ch(k: Int): Int = {
        val before = ramp((i - 1) * 5 + k).toInt
        val after = ramp(i * 5 + k).toInt
        val x = (0.5 + before + ratio * (after - before)).toInt // trunc, as static_cast<int>
        if (x < 0) 0 else if (x > 255) 255 else x
      }
      (ch(4) << 24) | (ch(1) << 16) | (ch(2) << 8) | ch(3)
    }
  }

  /** Color-relief over a band: four planes (r, g, b, a), one
    * [[reliefColor]] per pixel. */
  def colorRelief(b: Array[Int], ramp: Array[Double], mode: Int): (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    require(ramp.length >= 5 && ramp.length % 5 == 0, "ramp = flattened (elev,r,g,b,a) rows")
    var e = 1
    while (e < ramp.length / 5) {
      require(ramp(e * 5) > ramp((e - 1) * 5), "ramp elevations must be strictly ascending")
      e += 1
    }
    val pr = new Array[Int](b.length); val pg = new Array[Int](b.length)
    val pb = new Array[Int](b.length); val pa = new Array[Int](b.length)
    var i = 0
    while (i < b.length) {
      val c = reliefColor(ramp, b(i).toDouble, mode)
      pr(i) = (c >>> 16) & 0xff; pg(i) = (c >>> 8) & 0xff
      pb(i) = c & 0xff; pa(i) = (c >>> 24) & 0xff
      i += 1
    }
    (pr, pg, pb, pa)
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

  /** Focal neighborhood order statistics — the `gdal raster neighbors`
    * method surface beyond mean/sum (apps/gdalalg_raster_neighbors.cpp:207
    * choices min | max | stddev | median | mode), with the reference
    * kernel-source's evaluation rules (frmts/vrt/vrtfilters.cpp:485
    * FilterData — behavior only, no code reuse) for the all-ones 3×3
    * kernel over a nodata-free band:
    *
    *  - window visited row-major (row offset outer, column inner);
    *  - `min`/`max`: plain extrema of the 9 values;
    *  - `stddev`: POPULATION stddev via Welford's running update in visit
    *    order, sqrt(M2/n) — n = 9 here (every coefficient nonzero, no
    *    nodata), and the loop order is kept identical so doubles match
    *    the reference to the ulp;
    *  - `median`: the middle of the 9 sorted values (odd window ⇒ the
    *    lower-nth_element/average-of-two even branch never runs);
    *  - `mode`: the value whose RUNNING count first reaches the final
    *    maximum (the reference updates its result only on
    *    `count > maxCount`), i.e. ties break toward the value whose
    *    final-count occurrence appears earliest in visit order;
    *  - borders replicate outward ("we replicate the edge valid values
    *    out"), the same clamped at() every kernel here uses.
    */
  def neighborStat(b: Array[Int], w: Int, h: Int, op: String): Array[Double] = {
    val code = op match {
      case "min" => 0
      case "max" => 1
      case "median" => 2
      case "mode" => 3
      case "stddev" => 4
      case bad => throw new IllegalArgumentException(s"unknown neighbor stat $bad")
    }
    val out = new Array[Double](w * h)
    val win = new Array[Double](9)
    val sorted = new Array[Double](9)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var i = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            win(i) = at(b, w, h, x + dx, y + dy)
            i += 1
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = code match {
          case 0 =>
            var m = win(0); var k = 1
            while (k < 9) { if (win(k) < m) m = win(k); k += 1 }
            m
          case 1 =>
            var m = win(0); var k = 1
            while (k < 9) { if (win(k) > m) m = win(k); k += 1 }
            m
          case 2 =>
            System.arraycopy(win, 0, sorted, 0, 9)
            java.util.Arrays.sort(sorted)
            sorted(4)
          case 3 =>
            // running count per visit position; result replaced only when
            // a count strictly exceeds the max seen so far
            var maxCount = 0; var res = 0.0; var k = 0
            while (k < 9) {
              var c = 1; var j = 0
              while (j < k) { if (win(j) == win(k)) c += 1; j += 1 }
              if (c > maxCount) { maxCount = c; res = win(k) }
              k += 1
            }
            res
          case _ =>
            var n = 0; var mean = 0.0; var m2 = 0.0; var k = 0
            while (k < 9) {
              n += 1
              val d = win(k) - mean
              mean += d / n
              m2 += d * (win(k) - mean)
              k += 1
            }
            math.sqrt(m2 / 9.0)
        }
        x += 1
      }
      y += 1
    }
    out
  }
}
