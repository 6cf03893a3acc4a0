package graft.core

/** Color/fusion operators (SURVEY.md §2.8 optional rows):
  *  - pansharpen: weighted-Brovey fusion (alg/gdalpansharpen.cpp:588:
  *    out_i = ms_i · pan / Σ w_j·ms_j, ms upsampled to pan resolution);
  *  - median-cut palette (alg/gdalmediancut.cpp behavior: recursively
  *    split the RGB box with the widest axis at its median until the
  *    color budget is met, palette = per-box mean);
  *  - Floyd–Steinberg dither to a palette (alg/gdaldither.cpp behavior:
  *    nearest palette color + 7/16, 3/16, 5/16, 1/16 error diffusion).
  */
object Color {

  /** Weighted Brovey: ms (low-res, any band count) fused with pan
    * (panW×panH, = 2× ms size here upsampled bilinearly). */
  def pansharpen(pan: Array[Int], panW: Int, panH: Int, ms: Raster,
                 weights: Array[Double]): Raster = {
    require(weights.length == ms.nBands, "one weight per ms band")
    val out = Array.fill(ms.nBands)(new Array[Int](panW * panH))
    var y = 0
    while (y < panH) {
      var x = 0
      while (x < panW) {
        // source position in ms pixel coords (pan pixel center mapped back)
        val sx = (x + 0.5) * ms.w / panW
        val sy = (y + 0.5) * ms.h / panH
        var pseudo = 0.0
        val up = new Array[Double](ms.nBands)
        var b = 0
        while (b < ms.nBands) {
          up(b) = bilinearAt(ms.bands(b), ms.w, ms.h, sx, sy)
          pseudo += weights(b) * up(b)
          b += 1
        }
        val ratio = if (pseudo == 0.0) 0.0 else pan(y * panW + x) / pseudo
        b = 0
        while (b < ms.nBands) {
          val v = math.floor(up(b) * ratio + 0.5).toInt
          out(b)(y * panW + x) = if (v < 0) 0 else if (v > 255) 255 else v
          b += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(panW, panH, out)
  }

  private def bilinearAt(band: Array[Int], w: Int, h: Int, sx: Double, sy: Double): Double = {
    val fx = sx - 0.5; val fy = sy - 0.5
    val x0 = math.floor(fx).toInt; val y0 = math.floor(fy).toInt
    val tx = fx - x0; val ty = fy - y0
    @inline def p(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
      val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
      band(cy * w + cx)
    }
    p(x0, y0) * (1 - tx) * (1 - ty) + p(x0 + 1, y0) * tx * (1 - ty) +
      p(x0, y0 + 1) * (1 - tx) * ty + p(x0 + 1, y0 + 1) * tx * ty
  }

  /** Median-cut palette over an RGB raster (3 bands), ≤ nColors entries. */
  def medianCutPalette(r: Raster, nColors: Int): Array[(Int, Int, Int)] = {
    require(r.nBands >= 3, "median cut needs rgb")
    val n = r.w * r.h
    val px = Array.tabulate(n)(i => (r.bands(0)(i), r.bands(1)(i), r.bands(2)(i)))
    var boxes = List(px)
    var splittable = true
    while (boxes.length < nColors && splittable) {
      // split the box with the widest channel range; if even the widest
      // box is a single color, nothing is splittable
      val sortedBoxes = boxes.sortBy(b => -boxRange(b)._2)
      val box = sortedBoxes.head
      val (axis, range) = boxRange(box)
      if (range == 0) splittable = false
      else {
        val sorted = box.sortBy(p => channel(p, axis))
        val (lo, hi) = sorted.splitAt(sorted.length / 2)
        boxes = lo :: hi :: sortedBoxes.tail
      }
    }
    boxes.map(mean3).toArray
  }

  private def channel(p: (Int, Int, Int), axis: Int): Int =
    axis match { case 0 => p._1; case 1 => p._2; case _ => p._3 }

  private def boxRange(box: Array[(Int, Int, Int)]): (Int, Int) = {
    var best = 0; var bestRange = -1
    var a = 0
    while (a < 3) {
      var mn = 256; var mx = -1
      box.foreach { p => val v = channel(p, a); if (v < mn) mn = v; if (v > mx) mx = v }
      if (mx - mn > bestRange) { bestRange = mx - mn; best = a }
      a += 1
    }
    (best, bestRange)
  }

  /** First median-cut split invariants (integer-exact and SQL-derivable —
    * the q81 oracle for the otherwise irreducible recursion): the widest
    * axis (ties → lowest, boxRange's rule), the split-channel value at
    * the median position, the lo-box size, and the split-channel sums of
    * both halves (tie placement cannot affect them: tied pixels share the
    * channel value). None for uniform rasters (nothing splittable). */
  def firstSplit(r: Raster): Option[(Int, Int, Int, Long, Long)] = {
    if (r.nBands < 3) return None
    val n = r.w * r.h
    val px = Array.tabulate(n)(i => (r.bands(0)(i), r.bands(1)(i), r.bands(2)(i)))
    val (axis, range) = boxRange(px)
    if (range == 0) return None
    val sorted = px.sortBy(p => channel(p, axis))
    val half = n / 2
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < n) {
      if (i < half) lo += channel(sorted(i), axis) else hi += channel(sorted(i), axis)
      i += 1
    }
    Some((axis, channel(sorted(half), axis), half, lo, hi))
  }

  private def mean3(box: Array[(Int, Int, Int)]): (Int, Int, Int) = {
    if (box.isEmpty) return (0, 0, 0)
    var r = 0L; var g = 0L; var b = 0L
    box.foreach { p => r += p._1; g += p._2; b += p._3 }
    ((r / box.length).toInt, (g / box.length).toInt, (b / box.length).toInt)
  }

  /** Floyd–Steinberg dither of an RGB raster to `palette`; returns the
    * palette-index raster. Serpentine-free left-to-right scan with the
    * classic 7/16, 3/16, 5/16, 1/16 kernel. */
  def ditherFS(r: Raster, palette: Array[(Int, Int, Int)]): Array[Int] = {
    val w = r.w; val h = r.h
    val err = Array.ofDim[Double](3, w * h)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val cr = clamp(r.bands(0)(i) + err(0)(i))
        val cg = clamp(r.bands(1)(i) + err(1)(i))
        val cb = clamp(r.bands(2)(i) + err(2)(i))
        var best = 0; var bestD = Double.MaxValue
        var k = 0
        while (k < palette.length) {
          val p = palette(k)
          val d = (cr - p._1) * (cr - p._1) + (cg - p._2) * (cg - p._2) + (cb - p._3) * (cb - p._3)
          if (d < bestD) { bestD = d; best = k }
          k += 1
        }
        out(i) = best
        val p = palette(best)
        val er = cr - p._1; val eg = cg - p._2; val eb = cb - p._3
        @inline def spread(dx: Int, dy: Int, f: Double): Unit = {
          val nx = x + dx; val ny = y + dy
          if (nx >= 0 && nx < w && ny < h) {
            val j = ny * w + nx
            err(0)(j) += er * f; err(1)(j) += eg * f; err(2)(j) += eb * f
          }
        }
        spread(1, 0, 7.0 / 16); spread(-1, 1, 3.0 / 16)
        spread(0, 1, 5.0 / 16); spread(1, 1, 1.0 / 16)
        x += 1
      }
      y += 1
    }
    out
  }

  @inline private def clamp(v: Double): Double = if (v < 0) 0 else if (v > 255) 255 else v
}
