package graft.core

/** Viewshed over a single-band DEM — the reference's Wang et al.
  * auxiliary-plane propagation (alg/viewshed/viewshed_executor.cpp), in
  * its default configuration: Normal output mode (visible/invisible
  * bytes) and Edge cell mode.
  *
  * Propagation semantics (behavior, not code):
  *  - heights are adjusted per cell to `dem − (adjFactor·r² + zObserver)`
  *    with zObserver = dem[observer] + observerHeight (adjustHeight,
  *    :353; adjFactor = 0 disables the curved-earth/refraction term and
  *    r is measured in CELL units — this engine's rasters carry their
  *    georeferencing separately);
  *  - observer row: minimum-visible-height ray stretch
  *    z(d) = cur(d−1)·d/(d−1), adjacent cell always visible
  *    (CalcHeightLine :61, processFirstLineLeft/Right :587/:810);
  *  - observer column on each subsequent line: same 1-D rule through
  *    prev[ox] (processLine :~525);
  *  - exact diagonals: z = prev-diagonal·d/(d−1) (CalcHeightLine 2-arg
  *    :72, the |xOff| == |yOff| branch of processLineLeft :~730);
  *  - everything else (Edge mode): the plane through the origin and the
  *    two already-processed neighbors toward the observer —
  *    z = (Za·i + Zb·(j−i))/(j−1) with (i,j) the sorted offsets and
  *    (Za, Zb) chosen per the doEdge operand rule (:94-114);
  *  - a cell is visible iff adjustedHeight + targetHeight ≥ z, and the
  *    running line stores max(adjustedHeight, z) so occlusion propagates
  *    (setOutputNormal :228).
  *
  * Scale shape: one raster = one kernel call (the reference's
  * per-dataset executor); the distributed operator maps it per row, so a
  * corpus of DEMs parallelizes embarrassingly. The propagation itself is
  * inherently sequential per raster (each ring depends on the previous),
  * exactly as in the reference.
  */
object Viewshed {

  /** Visibility map (row-major, `visibleVal`/`invisibleVal` per cell) of
    * `dem` (row-major ints) from observer cell (ox, oy). */
  def viewshed(dem: Array[Int], w: Int, h: Int, ox: Int, oy: Int,
               observerHeight: Double = 2.0, targetHeight: Double = 0.0,
               visibleVal: Int = 255, invisibleVal: Int = 0,
               heightAdjFactor: Double = 0.0): Array[Int] = {
    require(w > 0 && h > 0 && dem.length == w * h, "dem must be w*h")
    require(ox >= 0 && ox < w && oy >= 0 && oy < h, "observer must be inside the raster")
    val zObs = dem(oy * w + ox) + observerHeight
    val result = new Array[Int](w * h)

    def adjLine(y: Int): Array[Double] = {
      val a = new Array[Double](w)
      val dy = (y - oy).toDouble
      var x = 0
      while (x < w) {
        val dx = (x - ox).toDouble
        a(x) = dem(y * w + x) - (heightAdjFactor * (dx * dx + dy * dy) + zObs)
        x += 1
      }
      a
    }

    // CalcHeightEdge: plane through origin and the two operand points
    @inline def edge(i: Int, j: Int, za: Double, zb: Double): Double =
      (za * i + zb * (j - i)) / (j - 1)

    // visible test + max-propagation (setOutputNormal, Normal mode)
    def setOutput(cur: Array[Double], y: Int, x: Int, z: Double): Unit = {
      val cellHeight = cur(x) + targetHeight
      result(y * w + x) = if (cellHeight < z) invisibleVal else visibleVal
      if (z > cur(x)) cur(x) = z
    }

    // ---- observer line ----
    val first = adjLine(oy)
    result(oy * w + ox) = visibleVal
    if (ox - 1 >= 0) setOutput(first, oy, ox - 1, first(ox - 1))
    var x = ox - 2
    while (x >= 0) {
      val d = ox - x
      setOutput(first, oy, x, first(x + 1) * d / (d - 1))
      x -= 1
    }
    if (ox + 1 < w) setOutput(first, oy, ox + 1, first(ox + 1))
    x = ox + 2
    while (x < w) {
      val d = x - ox
      setOutput(first, oy, x, first(x - 1) * d / (d - 1))
      x += 1
    }

    // ---- subsequent lines (one direction at a time) ----
    def processLine(yOff: Int, prev: Array[Double]): Array[Double] = {
      val y = oy + yOff
      val ay = math.abs(yOff)
      val cur = adjLine(y)
      // observer column: 1-D rule through prev[ox]
      val zc = if (ay == 1) cur(ox) else prev(ox) * ay / (ay - 1)
      setOutput(cur, y, ox, zc)
      // left of the observer column
      var i = ox - 1
      while (i >= 0) {
        val nX = ox - i
        val z =
          if (nX == ay) { if (ay == 1) cur(i) else prev(i + 1) * ay / (ay - 1) }
          else if (nX >= ay) edge(ay, nX, prev(i + 1), cur(i + 1))
          else edge(nX, ay, prev(i + 1), prev(i))
        setOutput(cur, y, i, z)
        i -= 1
      }
      // right of the observer column (mirrored operand roles)
      i = ox + 1
      while (i < w) {
        val nX = i - ox
        val z =
          if (nX == ay) { if (ay == 1) cur(i) else prev(i - 1) * ay / (ay - 1) }
          else if (nX >= ay) edge(ay, nX, prev(i - 1), cur(i - 1))
          else edge(nX, ay, prev(i - 1), prev(i))
        setOutput(cur, y, i, z)
        i += 1
      }
      cur
    }

    var prevUp = first
    var yOff = -1
    while (oy + yOff >= 0) { prevUp = processLine(yOff, prevUp); yOff -= 1 }
    var prevDown = first
    yOff = 1
    while (oy + yOff < h) { prevDown = processLine(yOff, prevDown); yOff += 1 }

    result
  }

  /** Visibility of the target cell alone — a line-of-sight test with the
    * same propagation semantics (runs the ray's sector only would be an
    * optimization; at raster sizes used per-row the full pass is cheap
    * and guarantees identical semantics). */
  def lineOfSight(dem: Array[Int], w: Int, h: Int, ox: Int, oy: Int,
                  tx: Int, ty: Int, observerHeight: Double = 2.0,
                  targetHeight: Double = 0.0): Boolean =
    viewshed(dem, w, h, ox, oy, observerHeight, targetHeight)(ty * w + tx) != 0
}
