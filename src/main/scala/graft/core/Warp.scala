package graft.core

/** Destination-driven warp/reproject of a single raster, the per-row kernel
  * of the distributed warp operator.
  *
  * Semantics follow the reference's design (behavior only): for each dst
  * pixel, inverse-transform its center to source pixel coordinates and apply
  * the resampling kernel over the source neighborhood, honoring nodata
  * (alg/gdalwarpoperation.cpp design doc :90-145; kernels per
  * alg/gdalwarpkernel.cpp:102-136 — near/bilinear/cubic(Catmull-Rom) — and
  * GWKAverageOrMode :194). The reference's chunking/thread machinery is NOT
  * ported: Spark's task parallelism replaces it (one (image|tile) = one
  * task), per SURVEY.md §3.2.
  *
  * Includes the reference's approx-transformer idea
  * (alg/gdaltransformer.cpp:2633): when src/dst CRS differ, each scanline
  * transforms only 3 points exactly and linearly interpolates the rest if
  * the midpoint error < 0.125 px, cutting transcendental calls ~w/3×.
  */
object Warp {
  val Near = "near"
  val Bilinear = "bilinear"
  val Cubic = "cubic"
  val Average = "average"
  val CubicSpline = "cubicspline"
  val Lanczos = "lanczos"
  val Mode = "mode"
  val Min = "min"
  val Max = "max"
  val Med = "med"
  val Q1 = "q1"
  val Q3 = "q3"
  val Sum = "sum"
  val Rms = "rms"

  /** Full resampler set of alg/gdalwarper.h:35-69 (near bilinear cubic
    * cubicspline lanczos average mode min max med q1 q3 sum rms). */
  val Kernels: Seq[String] =
    Seq(Near, Bilinear, Cubic, CubicSpline, Lanczos, Average, Mode, Min, Max, Med, Q1, Q3, Sum, Rms)

  def warp(src: Raster, srcGt: Array[Double], srcSrid: Int,
           dstGt: Array[Double], dstSrid: Int, dw: Int, dh: Int,
           kernel: String, nodata: Int = 0): Raster = {
    val out = Array.fill(src.nBands)(Array.fill(dw * dh)(nodata))
    warpInto(src, srcGt, srcSrid, dstGt, dstSrid, dw, dh, kernel, nodata, out)
    Raster(dw, dh, out)
  }

  /** Allocation-lean variant: samples ONLY the dst window that can hit the
    * source, writing into caller-provided (reusable) band arrays, and
    * returns that window as (px0, py0, px1, py1) inclusive — or
    * (0,0,-1,-1) when empty. Pixels outside the window are NOT touched;
    * the caller owns their initialization. Per-tile mosaic pipelines call
    * this with thread-local scratch so the allocation rate stays O(output
    * bytes), not O(tile area × bands × 4). */
  def warpInto(src: Raster, srcGt: Array[Double], srcSrid: Int,
               dstGt: Array[Double], dstSrid: Int, dw: Int, dh: Int,
               kernel: String, nodata: Int, out: Array[Array[Int]]): (Int, Int, Int, Int) = {
    val inv = GeoTransform.invert(srcGt).getOrElse(
      throw new IllegalArgumentException("degenerate src geotransform"))
    val sameCrs = srcSrid == dstSrid

    // transform dst pixel center -> src pixel coords
    @inline def toSrc(px: Double, py: Double): (Double, Double) = {
      val gx = GeoTransform.applyX(dstGt, px, py)
      val gy = GeoTransform.applyY(dstGt, px, py)
      val (sx, sy) = if (sameCrs) (gx, gy) else CrsTransform.transform(dstSrid, srcSrid, gx, gy)
      (GeoTransform.applyX(inv, sx, sy), GeoTransform.applyY(inv, sx, sy))
    }

    // Restrict the dst loop to the window that can actually hit the source
    // (the reference's ComputeSourceWindow edge-walk idea in reverse,
    // alg/gdalwarpoperation.cpp:138): walk the source boundary forward into
    // dst pixels, pad for kernel radius + curvature, clamp. Everything
    // outside stays nodata without being computed.
    val invDst = GeoTransform.invert(dstGt).getOrElse(
      throw new IllegalArgumentException("degenerate dst geotransform"))
    var minPx = Double.MaxValue; var maxPx = -Double.MaxValue
    var minPy = Double.MaxValue; var maxPy = -Double.MaxValue
    val steps = 8
    var si = 0
    while (si <= steps) {
      val t = si.toDouble / steps
      // 4 edges of the source raster in pixel space
      val edgePts = Array(
        (t * src.w, 0.0), (t * src.w, src.h.toDouble),
        (0.0, t * src.h), (src.w.toDouble, t * src.h))
      edgePts.foreach { case (spx, spy) =>
        val gx = GeoTransform.applyX(srcGt, spx, spy)
        val gy = GeoTransform.applyY(srcGt, spx, spy)
        val (dx, dy) = if (sameCrs) (gx, gy) else CrsTransform.transform(srcSrid, dstSrid, gx, gy)
        val ppx = GeoTransform.applyX(invDst, dx, dy)
        val ppy = GeoTransform.applyY(invDst, dx, dy)
        if (ppx < minPx) minPx = ppx
        if (ppx > maxPx) maxPx = ppx
        if (ppy < minPy) minPy = ppy
        if (ppy > maxPy) maxPy = ppy
      }
      si += 1
    }
    val pad = 3.0 // kernel radius (cubic: 2) + curvature slack
    val px0 = math.max(0, math.floor(minPx - pad).toInt)
    val px1 = math.min(dw - 1, math.ceil(maxPx + pad).toInt)
    val py0 = math.max(0, math.floor(minPy - pad).toInt)
    val py1 = math.min(dh - 1, math.ceil(maxPy + pad).toInt)
    if (px1 < px0 || py1 < py0) return (0, 0, -1, -1)

    val kcode = kernel match {
      case Near => 0
      case Bilinear => 1
      case Cubic => 2
      case Average => 3
      case CubicSpline => 4
      case Lanczos => 5
      case Mode => 6
      case Min => 7
      case Max => 8
      case Med => 9
      case Q1 => 10
      case Q3 => 11
      case Sum => 12
      case Rms => 13
      case other => throw new IllegalArgumentException(s"unknown kernel $other")
    }
    val winW = px1 - px0 + 1
    val srcXs = new Array[Double](winW)
    val srcYs = new Array[Double](winW)
    val nBands = src.nBands

    var py = py0
    while (py <= py1) {
      fillScanlineWindow(toSrc, py + 0.5, px0, winW, srcXs, srcYs, exact = sameCrs)
      var px = px0
      while (px <= px1) {
        val sx = srcXs(px - px0)
        val sy = srcYs(px - px0)
        var b = 0
        while (b < nBands) {
          out(b)(py * dw + px) = kcode match {
            case 0 => sampleNear(src.bands(b), src.w, src.h, sx, sy, nodata)
            case 1 => sampleBilinear(src.bands(b), src.w, src.h, sx, sy, nodata)
            case 2 => sampleCubic(src.bands(b), src.w, src.h, sx, sy, nodata)
            case 4 => sampleCubicSpline(src.bands(b), src.w, src.h, sx, sy, nodata)
            case 5 => sampleLanczos(src.bands(b), src.w, src.h, sx, sy, nodata)
            case _ => sampleAggAt(src, b, toSrc, px, py, nodata, kcode)
          }
          b += 1
        }
        px += 1
      }
      py += 1
    }
    (px0, py0, px1, py1)
  }

  /** Scanline src-coord fill over a window starting at dst pixel px0. */
  private def fillScanlineWindow(toSrc: (Double, Double) => (Double, Double), py: Double,
                                 px0: Int, winW: Int, xs: Array[Double], ys: Array[Double],
                                 exact: Boolean): Unit = {
    val (x0, y0) = toSrc(px0 + 0.5, py)
    if (winW == 1) { xs(0) = x0; ys(0) = y0; return }
    val (x1, y1) = toSrc(px0 + winW - 0.5, py)
    if (exact) {
      val dx = (x1 - x0) / (winW - 1)
      val dy = (y1 - y0) / (winW - 1)
      var i = 0
      while (i < winW) { xs(i) = x0 + i * dx; ys(i) = y0 + i * dy; i += 1 }
    } else {
      xs(0) = x0; ys(0) = y0; xs(winW - 1) = x1; ys(winW - 1) = y1
      subdivideWindow(toSrc, py, px0, 0, winW - 1, xs, ys)
    }
  }

  private def subdivideWindow(toSrc: (Double, Double) => (Double, Double), py: Double, px0: Int,
                              i0: Int, i1: Int, xs: Array[Double], ys: Array[Double]): Unit = {
    if (i1 - i0 <= 1) return
    val mid = (i0 + i1) / 2
    val (mx, my) = toSrc(px0 + mid + 0.5, py)
    xs(mid) = mx; ys(mid) = my
    val t = (mid - i0).toDouble / (i1 - i0)
    val lx = xs(i0) + t * (xs(i1) - xs(i0))
    val ly = ys(i0) + t * (ys(i1) - ys(i0))
    val err = math.max(math.abs(lx - mx), math.abs(ly - my))
    if (err < 0.125) {
      var i = i0 + 1
      while (i < i1) {
        if (i != mid) {
          if (i < mid) {
            val tt = (i - i0).toDouble / (mid - i0)
            xs(i) = xs(i0) + tt * (mx - xs(i0)); ys(i) = ys(i0) + tt * (my - ys(i0))
          } else {
            val tt = (i - mid).toDouble / (i1 - mid)
            xs(i) = mx + tt * (xs(i1) - mx); ys(i) = my + tt * (ys(i1) - my)
          }
        }
        i += 1
      }
    } else {
      subdivideWindow(toSrc, py, px0, i0, mid, xs, ys)
      subdivideWindow(toSrc, py, px0, mid, i1, xs, ys)
    }
  }

  @inline def sampleNear(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double, nodata: Int): Int = {
    val x = math.floor(sx).toInt
    val y = math.floor(sy).toInt
    if (x < 0 || x >= w || y < 0 || y >= h) nodata else band(y * w + x)
  }

  @inline private def pix(band: Array[Int], w: Int, h: Int, x: Int, y: Int): Int = {
    val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
    val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
    band(cy * w + cx)
  }

  def sampleBilinear(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double, nodata: Int): Int = {
    if (sx < 0 || sx > w || sy < 0 || sy > h) return nodata
    val fx = sx - 0.5
    val fy = sy - 0.5
    val x0 = math.floor(fx).toInt
    val y0 = math.floor(fy).toInt
    val tx = fx - x0
    val ty = fy - y0
    val v00 = pix(band, w, h, x0, y0)
    val v10 = pix(band, w, h, x0 + 1, y0)
    val v01 = pix(band, w, h, x0, y0 + 1)
    val v11 = pix(band, w, h, x0 + 1, y0 + 1)
    val v = v00 * (1 - tx) * (1 - ty) + v10 * tx * (1 - ty) + v01 * (1 - tx) * ty + v11 * tx * ty
    clamp255(math.floor(v + 0.5).toInt)
  }

  /** Catmull-Rom cubic (the reference's "cubic", a = -0.5). */
  def sampleCubic(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double, nodata: Int): Int = {
    if (sx < 0 || sx > w || sy < 0 || sy > h) return nodata
    val fx = sx - 0.5
    val fy = sy - 0.5
    val x0 = math.floor(fx).toInt
    val y0 = math.floor(fy).toInt
    val tx = fx - x0
    val ty = fy - y0
    @inline def cw(t: Double): (Double, Double, Double, Double) = {
      val t2 = t * t; val t3 = t2 * t
      (-0.5 * t3 + t2 - 0.5 * t,
        1.5 * t3 - 2.5 * t2 + 1.0,
        -1.5 * t3 + 2.0 * t2 + 0.5 * t,
        0.5 * t3 - 0.5 * t2)
    }
    val (wx0, wx1, wx2, wx3) = cw(tx)
    val (wy0, wy1, wy2, wy3) = cw(ty)
    var acc = 0.0
    var j = -1
    var wyIdx = 0
    val wys = Array(wy0, wy1, wy2, wy3)
    val wxs = Array(wx0, wx1, wx2, wx3)
    while (j <= 2) {
      var i = -1
      var rowAcc = 0.0
      while (i <= 2) {
        rowAcc += wxs(i + 1) * pix(band, w, h, x0 + i, y0 + j)
        i += 1
      }
      acc += wys(wyIdx) * rowAcc
      j += 1
      wyIdx += 1
    }
    clamp255(math.floor(acc + 0.5).toInt)
  }

  /** Cubic B-spline (the reference's "cubicspline", a SMOOTHING — not
    * interpolating — 4-tap kernel; weight polynomial per the published
    * uniform cubic B-spline basis, GWKBSpline semantics). Separable,
    * normalized by the weight sum so edges stay unbiased. */
  def sampleCubicSpline(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double, nodata: Int): Int = {
    if (sx < 0 || sx > w || sy < 0 || sy > h) return nodata
    @inline def bspline(x: Double): Double = {
      val xp2 = x + 2.0; val xp1 = x + 1.0; val xm1 = x - 1.0
      var v = 0.0
      if (xp2 > 0.0) v += xp2 * xp2 * xp2
      if (xp1 > 0.0) v -= 4.0 * xp1 * xp1 * xp1
      if (x > 0.0) v += 6.0 * x * x * x
      if (xm1 > 0.0) v -= 4.0 * xm1 * xm1 * xm1
      v // scaled by 6; normalization below cancels the factor
    }
    separable4plus(band, w, h, sx, sy, 2, bspline)
  }

  /** Lanczos windowed sinc, 3 lobes (6×6 taps), weight-normalized. */
  def sampleLanczos(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double, nodata: Int): Int = {
    if (sx < 0 || sx > w || sy < 0 || sy > h) return nodata
    @inline def lanczos(x: Double): Double = {
      if (x == 0.0) 1.0
      else if (math.abs(x) >= 3.0) 0.0
      else {
        val px = math.Pi * x
        (math.sin(px) * math.sin(px / 3.0)) / (px * (px / 3.0))
      }
    }
    separable4plus(band, w, h, sx, sy, 3, lanczos)
  }

  /** Shared separable convolution over taps within `radius` of the sample
    * point (pixel-center convention), normalized by the weight sum. */
  private def separable4plus(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double,
                             radius: Int, weight: Double => Double): Int = {
    val fx = sx - 0.5
    val fy = sy - 0.5
    val x0 = math.floor(fx).toInt
    val y0 = math.floor(fy).toInt
    val tx = fx - x0
    val ty = fy - y0
    var acc = 0.0
    var wAcc = 0.0
    var j = -radius + 1
    while (j <= radius) {
      val wy = weight(j - ty)
      if (wy != 0.0) {
        var rowAcc = 0.0
        var rowW = 0.0
        var i = -radius + 1
        while (i <= radius) {
          val wx = weight(i - tx)
          if (wx != 0.0) {
            rowAcc += wx * pix(band, w, h, x0 + i, y0 + j)
            rowW += wx
          }
          i += 1
        }
        acc += wy * rowAcc
        wAcc += wy * rowW
      }
      j += 1
    }
    if (wAcc == 0.0) pix(band, w, h, x0, y0)
    else clamp255(math.floor(acc / wAcc + 0.5).toInt)
  }

  /** Footprint-aggregate resamplers (GWKAverageOrMode family): statistic
    * over the src pixels whose centers fall inside the dst pixel's source
    * quad. Quantiles pick sorted[ceil(q·n − 1)] (the reference's rule,
    * gdalwarpkernel.cpp:8338); mode ties resolve to the value FIRST
    * reaching the max count in row-major scan order. */
  private def sampleAggAt(src: Raster, b: Int, toSrc: (Double, Double) => (Double, Double),
                          px: Int, py: Int, nodata: Int, kcode: Int): Int = {
    val (x0, y0) = toSrc(px.toDouble, py.toDouble)
    val (x1, y1) = toSrc(px + 1.0, py + 1.0)
    val minx = math.min(x0, x1); val maxx = math.max(x0, x1)
    val miny = math.min(y0, y1); val maxy = math.max(y0, y1)
    val ix0 = math.max(0, math.floor(minx).toInt)
    val ix1 = math.min(src.w - 1, math.ceil(maxx).toInt - 1)
    val iy0 = math.max(0, math.floor(miny).toInt)
    val iy1 = math.min(src.h - 1, math.ceil(maxy).toInt - 1)
    if (ix1 < ix0 || iy1 < iy0)
      return sampleNear(src.bands(b), src.w, src.h, (minx + maxx) / 2, (miny + maxy) / 2, nodata)
    val band = src.bands(b)
    kcode match {
      case 3 => // average
        var sum = 0L; var cnt = 0
        var y = iy0
        while (y <= iy1) {
          var x = ix0
          while (x <= ix1) { sum += band(y * src.w + x); cnt += 1; x += 1 }
          y += 1
        }
        clamp255(math.floor(sum.toDouble / cnt + 0.5).toInt)
      case 6 => // mode, first-to-reach tie rule
        val counts = new Array[Int](256)
        var best = -1; var bestN = 0
        var y = iy0
        while (y <= iy1) {
          var x = ix0
          while (x <= ix1) {
            val v = band(y * src.w + x) & 0xFF
            counts(v) += 1
            if (counts(v) > bestN) { bestN = counts(v); best = v }
            x += 1
          }
          y += 1
        }
        best
      case 7 => // min
        var m = Int.MaxValue
        var y = iy0
        while (y <= iy1) {
          var x = ix0
          while (x <= ix1) { val v = band(y * src.w + x); if (v < m) m = v; x += 1 }
          y += 1
        }
        m
      case 8 => // max
        var m = Int.MinValue
        var y = iy0
        while (y <= iy1) {
          var x = ix0
          while (x <= ix1) { val v = band(y * src.w + x); if (v > m) m = v; x += 1 }
          y += 1
        }
        m
      case 12 => // sum (clamped to dtype range like the reference)
        var sum = 0L
        var y = iy0
        while (y <= iy1) {
          var x = ix0
          while (x <= ix1) { sum += band(y * src.w + x); x += 1 }
          y += 1
        }
        clamp255(if (sum > Int.MaxValue) Int.MaxValue else sum.toInt)
      case 13 => // rms
        var sum2 = 0L; var cnt = 0
        var y = iy0
        while (y <= iy1) {
          var x = ix0
          while (x <= ix1) {
            val v = band(y * src.w + x).toLong
            sum2 += v * v; cnt += 1; x += 1
          }
          y += 1
        }
        clamp255(math.floor(math.sqrt(sum2.toDouble / cnt) + 0.5).toInt)
      case q => // med / q1 / q3
        val quant = q match { case 9 => 0.5; case 10 => 0.25; case 11 => 0.75
          case other => throw new IllegalArgumentException(s"bad agg kcode $other") }
        val n = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        val vals = new Array[Int](n)
        var k = 0
        var y = iy0
        while (y <= iy1) {
          var x = ix0
          while (x <= ix1) { vals(k) = band(y * src.w + x); k += 1; x += 1 }
          y += 1
        }
        java.util.Arrays.sort(vals)
        vals(math.max(0, math.ceil(quant * n - 1).toInt))
    }
  }

  /** 2× box-average downsample, the overview/pyramid reduce step
    * (gcore/overview.cpp average path semantics for the even case). */
  def downsample2x(r: Raster): Raster = {
    val dw = (r.w + 1) / 2
    val dh = (r.h + 1) / 2
    val out = Array.fill(r.nBands)(new Array[Int](dw * dh))
    var b = 0
    while (b < r.nBands) {
      val band = r.bands(b)
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          var sum = 0
          var cnt = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val sx2 = 2 * x + dx; val sy2 = 2 * y + dy
              if (sx2 < r.w && sy2 < r.h) { sum += band(sy2 * r.w + sx2); cnt += 1 }
              dx += 1
            }
            dy += 1
          }
          out(b)(y * dw + x) = math.floor(sum.toDouble / cnt + 0.5).toInt
          x += 1
        }
        y += 1
      }
      b += 1
    }
    Raster(dw, dh, out)
  }

  // ---- at-point interpolation (GDALInterpolateAtPoint surface,
  // ---- alg/gdal_interpolateatpoint.cpp:415: near/bilinear/cubicspline;
  // ---- unrounded double results) ----

  def samplePointBilinear(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double): Double = {
    val fx = sx - 0.5
    val fy = sy - 0.5
    val x0 = math.floor(fx).toInt
    val y0 = math.floor(fy).toInt
    val tx = fx - x0
    val ty = fy - y0
    pix(band, w, h, x0, y0) * (1 - tx) * (1 - ty) +
      pix(band, w, h, x0 + 1, y0) * tx * (1 - ty) +
      pix(band, w, h, x0, y0 + 1) * (1 - tx) * ty +
      pix(band, w, h, x0 + 1, y0 + 1) * tx * ty
  }

  def samplePointCubicSpline(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double): Double = {
    val fx = sx - 0.5
    val fy = sy - 0.5
    val x0 = math.floor(fx).toInt
    val y0 = math.floor(fy).toInt
    val tx = fx - x0
    val ty = fy - y0
    @inline def bspline(x: Double): Double = {
      val xp2 = x + 2.0; val xp1 = x + 1.0; val xm1 = x - 1.0
      var v = 0.0
      if (xp2 > 0.0) v += xp2 * xp2 * xp2
      if (xp1 > 0.0) v -= 4.0 * xp1 * xp1 * xp1
      if (x > 0.0) v += 6.0 * x * x * x
      if (xm1 > 0.0) v -= 4.0 * xm1 * xm1 * xm1
      v
    }
    var acc = 0.0
    var wAcc = 0.0
    var j = -1
    while (j <= 2) {
      val wy = bspline(j - ty)
      var rowAcc = 0.0
      var rowW = 0.0
      var i = -1
      while (i <= 2) {
        val wx = bspline(i - tx)
        rowAcc += wx * pix(band, w, h, x0 + i, y0 + j)
        rowW += wx
        i += 1
      }
      acc += wy * rowAcc
      wAcc += wy * rowW
      j += 1
    }
    acc / wAcc
  }

  /** 2× Gaussian overview (gcore/overview.cpp Gauss semantics for ratio 2:
    * 3×3 kernel {1,2,1;2,4,2;1,2,1} anchored at (2x, 2y), weight-
    * renormalized where the window clips the raster edge). */
  def downsample2xGauss(r: Raster): Raster = {
    val g = Array(1, 2, 1, 2, 4, 2, 1, 2, 1)
    val dw = (r.w + 1) / 2
    val dh = (r.h + 1) / 2
    val out = Array.fill(r.nBands)(new Array[Int](dw * dh))
    var b = 0
    while (b < r.nBands) {
      val band = r.bands(b)
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          var sum = 0L
          var wsum = 0L
          var j = 0
          while (j < 3) {
            val sy = 2 * y + j
            if (sy < r.h) {
              var i = 0
              while (i < 3) {
                val sx = 2 * x + i
                if (sx < r.w) {
                  val wgt = g(j * 3 + i)
                  sum += wgt.toLong * band(sy * r.w + sx)
                  wsum += wgt
                }
                i += 1
              }
            }
            j += 1
          }
          out(b)(y * dw + x) = math.floor(sum.toDouble / wsum + 0.5).toInt
          x += 1
        }
        y += 1
      }
      b += 1
    }
    Raster(dw, dh, out)
  }

  /** 2× lanczos overview (gcore/overview.cpp convolution path semantics:
    * the kernel is SCALED by the ratio for downsampling — taps weighted
    * lanczos(d/2) over a 12-tap support per axis, weight-normalized,
    * separable). */
  def downsample2xLanczos(r: Raster): Raster = {
    val dw = (r.w + 1) / 2
    val dh = (r.h + 1) / 2
    @inline def lanczos(x: Double): Double = {
      if (x == 0.0) 1.0
      else if (math.abs(x) >= 3.0) 0.0
      else {
        val px = math.Pi * x
        (math.sin(px) * math.sin(px / 3.0)) / (px * (px / 3.0))
      }
    }
    val out = Array.fill(r.nBands)(new Array[Int](dw * dh))
    // separable: horizontal pass into a temp, then vertical
    val tmp = Array.ofDim[Double](r.h, dw)
    var b = 0
    while (b < r.nBands) {
      val band = r.bands(b)
      var y = 0
      while (y < r.h) {
        var x = 0
        while (x < dw) {
          val sc = 2 * x + 1.0 - 0.5 // dst center in src pixel-index space
          var acc = 0.0; var wsum = 0.0
          var i = math.max(0, math.ceil(sc - 6.0).toInt)
          val iMax = math.min(r.w - 1, math.floor(sc + 6.0).toInt)
          while (i <= iMax) {
            val w = lanczos((i - sc) / 2.0)
            acc += w * band(y * r.w + i)
            wsum += w
            i += 1
          }
          tmp(y)(x) = acc / wsum
          x += 1
        }
        y += 1
      }
      var oy = 0
      while (oy < dh) {
        val sc = 2 * oy + 1.0 - 0.5
        var x = 0
        while (x < dw) {
          var acc = 0.0; var wsum = 0.0
          var j = math.max(0, math.ceil(sc - 6.0).toInt)
          val jMax = math.min(r.h - 1, math.floor(sc + 6.0).toInt)
          while (j <= jMax) {
            val w = lanczos((j - sc) / 2.0)
            acc += w * tmp(j)(x)
            wsum += w
            j += 1
          }
          val v = math.floor(acc / wsum + 0.5).toInt
          out(b)(oy * dw + x) = if (v < 0) 0 else if (v > 255) 255 else v
          x += 1
        }
        oy += 1
      }
      b += 1
    }
    Raster(dw, dh, out)
  }

  /** 2× mode overview (gcore/overview.cpp Mode): most frequent value of
    * each 2×2 block, ties to the value first reaching the max count in
    * row-major order. */
  def downsample2xMode(r: Raster): Raster = {
    val dw = (r.w + 1) / 2
    val dh = (r.h + 1) / 2
    val out = Array.fill(r.nBands)(new Array[Int](dw * dh))
    val counts = new Array[Int](256)
    var b = 0
    while (b < r.nBands) {
      val band = r.bands(b)
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          java.util.Arrays.fill(counts, 0)
          var best = -1; var bestN = 0
          var j = 0
          while (j < 2) {
            val sy = 2 * y + j
            if (sy < r.h) {
              var i = 0
              while (i < 2) {
                val sx = 2 * x + i
                if (sx < r.w) {
                  val v = band(sy * r.w + sx) & 0xFF
                  counts(v) += 1
                  if (counts(v) > bestN) { bestN = counts(v); best = v }
                }
                i += 1
              }
            }
            j += 1
          }
          out(b)(y * dw + x) = best
          x += 1
        }
        y += 1
      }
      b += 1
    }
    Raster(dw, dh, out)
  }

  @inline private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
}
