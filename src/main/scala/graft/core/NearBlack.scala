package graft.core

/** Collar trim — `nearblack` (reference: apps/nearblack_lib.cpp:371-537
  * GDALNearblackTwoPassesAlgorithm; behavior, not code).
  *
  * Two scanline passes (top-down, then bottom-up over the already-modified
  * data); each line runs a vertical column-counter check plus a
  * left-to-right horizontal scan, then a second right-to-left horizontal
  * scan. A pixel is "near" when EVERY band is within `nearDist` of the
  * collar color (0, or 255 with `white`). `maxNonBlack` tolerates short
  * runs of non-near pixels inside the collar ("grey areas",
  * nearblack_lib.cpp:569,595-614), with the documented exemptions when
  * valid data touches the raster edge directly. Replacement writes the
  * collar color, which is itself "near" — so the bottom-up pass sees
  * unchanged near-ness and the composite mask is well-defined.
  *
  * At maxNonBlack = 0 the state machine collapses to a closed form over
  * running windows (the q121 DuckDB oracle re-derives it): the vertical
  * component is the per-column prefix/suffix of all-near pixels, and the
  * horizontal scan blackens a near pixel iff no non-near pixel precedes
  * it in scan order OR some column-collar pixel lies between the last
  * non-near pixel and it (the `panLastLineCounts[i] == 0` re-enable,
  * nearblack_lib.cpp:734-738).
  */
object NearBlack {

  /** Runs the algorithm in place over planar int bands (values 0-255).
    * Returns the collar mask (true = pixel replaced by any scan). */
  def run(bands: Array[Array[Int]], w: Int, h: Int, nearDist: Int,
          maxNonBlack: Int, white: Boolean): Array[Boolean] = {
    require(bands.nonEmpty && bands(0).length == w * h, "planar bands of w*h")
    val color = if (white) 255 else 0
    val mask = new Array[Boolean](w * h)
    val counts = new Array[Int](w)

    def isNonNear(idx: Int): Boolean = {
      var b = 0
      while (b < bands.length) {
        val p = bands(b)(idx)
        if (color - p > nearDist || p > nearDist + color) return true
        b += 1
      }
      false
    }
    def replace(idx: Int): Unit = {
      var b = 0
      while (b < bands.length) { bands(b)(idx) = color; b += 1 }
      mask(idx) = true
    }

    // One ProcessLine: optional vertical column check, then a horizontal
    // scan from iStart toward (exclusive) iEnd.
    def processLine(y: Int, iStart: Int, iEnd: Int, doVertical: Boolean,
                    bottomUp: Boolean, lineFromEdge: Int): Unit = {
      val base = y * w
      if (doVertical) {
        val nX = math.max(iStart + 1, iEnd + 1)
        var i = 0
        while (i < nX) {
          if (counts(i) <= maxNonBlack) {
            if (isNonNear(base + i)) {
              counts(i) += 1
              if (counts(i) <= maxNonBlack) {
                // valid data on the very first line: collar ends here
                if (lineFromEdge == 0 && maxNonBlack > 0) counts(i) = maxNonBlack + 1
                else replace(base + i) // grey-area pixel inside the collar
              }
            } else replace(base + i)
          }
          i += 1
        }
      }
      val maxNB = if (bottomUp) 0 else maxNonBlack // bottom-up assumes 0
      var nonBlack = 0
      val dir = if (iStart < iEnd) 1 else -1
      var doTest = true
      var i = iStart
      while (i != iEnd) {
        if (doTest) {
          val nonNear = isNonNear(base + i)
          if (nonNear) {
            if (counts(i) <= maxNB) nonBlack = counts(i) else nonBlack += 1
          }
          if (nonBlack > maxNB) doTest = false
          else if (nonNear && maxNB > 0 && i == iStart) doTest = false
          else replace(base + i)
        } else if (counts(i) == 0) { // column still pure collar: re-enable
          doTest = true
          nonBlack = 0
        }
        i += dir
      }
    }

    java.util.Arrays.fill(counts, 0)
    var y = 0
    while (y < h) { // top-down
      processLine(y, 0, w - 1, doVertical = true, bottomUp = false, lineFromEdge = y)
      processLine(y, w - 1, 0, doVertical = false, bottomUp = false, lineFromEdge = y)
      y += 1
    }
    java.util.Arrays.fill(counts, 0)
    y = h - 1
    while (y >= 0) { // bottom-up
      processLine(y, 0, w - 1, doVertical = true, bottomUp = true, lineFromEdge = h - 1 - y)
      processLine(y, w - 1, 0, doVertical = false, bottomUp = true, lineFromEdge = h - 1 - y)
      y -= 1
    }
    mask
  }

  /** Independent closed-form mask for maxNonBlack = 0 (the oracle's window
    * formulation) — used by NearBlackSpec to cross-check [[run]]. */
  def maskClosedForm(band: Array[Int], w: Int, h: Int, nearDist: Int,
                     white: Boolean): Array[Boolean] = {
    val color = if (white) 255 else 0
    def near(i: Int): Boolean = {
      val p = band(i)
      !(color - p > nearDist || p > nearDist + color)
    }
    val vtd = new Array[Boolean](w * h)
    val vbu = new Array[Boolean](w * h)
    for (x <- 0 until w) {
      var all = true
      for (y <- 0 until h) { all &&= near(y * w + x); vtd(y * w + x) = all }
      all = true
      for (y <- (h - 1) to 0 by -1) { all &&= near(y * w + x); vbu(y * w + x) = all }
    }
    val out = new Array[Boolean](w * h)
    // horizontal: near pixel is trimmed iff no non-near precedes it in scan
    // order, or a column-collar (vall) pixel lies after the last non-near
    def horiz(vall: Array[Boolean]): Unit = for (y <- 0 until h) {
      var lastNonNear = -1
      var lastVall = -1
      for (x <- 0 until w) {
        val i = y * w + x
        val state = lastNonNear < 0 || lastVall > lastNonNear
        if (x <= w - 2 && state && near(i)) out(i) = true
        if (!near(i)) lastNonNear = x
        if (vall(i)) lastVall = x
      }
      var firstNonNear = w
      var firstVall = w
      for (x <- (w - 1) to 0 by -1) {
        val i = y * w + x
        val state = firstNonNear == w || firstVall < firstNonNear
        if (x >= 1 && state && near(i)) out(i) = true
        if (!near(i)) firstNonNear = x
        if (vall(i)) firstVall = x
      }
    }
    horiz(vtd)
    horiz(vbu)
    for (i <- 0 until w * h) if (vtd(i) || vbu(i)) out(i) = true
    out
  }
}
