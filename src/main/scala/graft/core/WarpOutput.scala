package graft.core

/** Suggested warp output sizing — the reference's transformer-driven
  * estimation of the destination raster's geotransform, size, and extent.
  *
  * Behavioral reference: alg/gdaltransformer.cpp GDALSuggestedWarpOutput2
  * (:342-1240):
  *  - sample the source edges at nSteps = clamp(min(w,h)/50 + 0.5, 20,
  *    100) intervals in top/bottom/left/right order (:452-524);
  *  - on a sign change (or failed neighbor) along the top/bottom rows,
  *    dichotomically refine up to 16 midpoints to tighten the extent
  *    near a discontinuity (:737-810);
  *  - if any edge point fails to transform, or the inverse roundtrip of
  *    the edge samples drifts by more than one sample step, fall back to
  *    a dense (nSteps+1)² interior grid (:615-705);
  *  - pixel size = diagonal distance between the transformed first and
  *    last sample over the source diagonal (:1077-1101), counts rounded
  *    +0.5 (or ceil − 1e-5 under ROUND_UP) (:1133-1143);
  *  - right/bottom border fitting: shrink the pixel size by ratios
  *    {0, .001, .01, .1, 1}/n until the border column/row is not
  *    completely outside the source (MustAdjustForRightBorder :190,
  *    MustAdjustForBottomBorder :244 — 21 roundtrip probes, adjust only
  *    when ALL are bad);
  *  - recompute max X / min Y from the chosen sizes and emit the
  *    north-up geotransform (:1193-1240).
  *
  * Scope: the geographic-degrees clamps (±180/−90) and the antimeridian
  * sign-discontinuity pass are omitted — the engine's CRS surface is
  * planar (3857/UTM); cited lines :540-610 for the excluded behavior.
  */
object WarpOutput {

  /** A bidirectional point transformer (pixel→geo / geo→pixel). */
  trait Transformer2D {
    def forward(x: Double, y: Double): Option[(Double, Double)]
    def inverse(x: Double, y: Double): Option[(Double, Double)]
  }

  /** Homography-backed transformer (also covers affine geotransforms,
    * which are homographies with (h6,h7,h8) = (1,0,0)). */
  def homographyTransformer(h: Array[Double]): Option[Transformer2D] =
    Homography.invert(h).map { hInv =>
      new Transformer2D {
        def forward(x: Double, y: Double): Option[(Double, Double)] = {
          val (tx, ty) = Homography.apply(h, x, y)
          if (tx.isNaN) None else Some((tx, ty))
        }
        def inverse(x: Double, y: Double): Option[(Double, Double)] = {
          val (tx, ty) = Homography.apply(hInv, x, y)
          if (tx.isNaN) None else Some((tx, ty))
        }
      }
    }

  final case class Result(gt: Array[Double], pixels: Int, lines: Int,
                          extent: Array[Double])

  def suggest(w: Int, h: Int, t: Transformer2D, roundUp: Boolean = false): Option[Result] = {
    var nSteps = (math.min(w, h).toDouble / 50 + 0.5).toInt
    if (nSteps < 20) nSteps = 20 else if (nSteps > 100) nSteps = 100
    val nsp = nSteps + 1
    val step = 1.0 / nSteps

    // edge samples in the reference's top/bottom/left/right order
    var xs = new Array[Double](4 * nsp)
    var ys = new Array[Double](4 * nsp)
    var ok = new Array[Boolean](4 * nsp)
    var n = 4 * nsp
    var i = 0
    while (i <= nSteps) {
      val r = if (i == nSteps) 1.0 else i * step
      xs(i) = r * w; ys(i) = 0.0
      xs(i + nsp) = r * w; ys(i + nsp) = h.toDouble
      xs(i + 2 * nsp) = 0.0; ys(i + 2 * nsp) = r * h
      xs(i + 3 * nsp) = w.toDouble; ys(i + 3 * nsp) = r * h
      i += 1
    }
    val inX = xs.clone(); val inY = ys.clone()
    var failed = transformAll(t, xs, ys, ok)

    // revert check: inverse of the transformed edges must land within one
    // sample step of the original pixel coords
    if (failed == 0) {
      val rx = xs.clone(); val ry = ys.clone(); val rok = new Array[Boolean](n)
      transformAllInv(t, rx, ry, rok)
      var j = 0
      var bad = false
      while (!bad && j < n) {
        if (!rok(j)) bad = true
        else if (math.abs(rx(j) - inX(j)) > w.toDouble / nSteps ||
          math.abs(ry(j) - inY(j)) > h.toDouble / nSteps) bad = true
        j += 1
      }
      if (bad) failed = 1
    }

    if (failed > 0) {
      // dense interior grid fallback
      n = nsp * nsp
      xs = new Array[Double](n); ys = new Array[Double](n)
      ok = new Array[Boolean](n)
      var k = 0
      i = 0
      while (i <= nSteps) {
        val r = if (i == nSteps) 1.0 else i * step
        var j = 0
        while (j <= nSteps) {
          val r2 = if (j == nSteps) 1.0 else j * step
          xs(k) = r2 * w; ys(k) = r * h; k += 1
          j += 1
        }
        i += 1
      }
      transformAll(t, xs, ys, ok)
    }

    // bounds, with dichotomic refinement at sign changes along the
    // top/bottom rows (x_i > 0 rows in the reference's index arithmetic)
    var minX = 0.0; var minY = 0.0; var maxX = 0.0; var maxY = 0.0
    var got = false
    @inline def fold(x: Double, y: Double): Unit =
      if (!got) { minX = x; maxX = x; minY = y; maxY = y; got = true }
      else {
        if (x < minX) minX = x; if (x > maxX) maxX = x
        if (y < minY) minY = y; if (y > maxY) maxY = y
      }
    val dense = n == nsp * nsp
    i = 0
    while (i < n) {
      val xi = if (dense) i % nsp else if (i < 2 * nsp) i % nsp else 0
      val yi = if (dense) i / nsp else if (i < nsp) 0 else nSteps
      if (xi > 0 && (ok(i - 1) || ok(i))) {
        var xob = xs(i - 1); var xoa = xs(i)
        var xib = (xi - 1).toDouble * w / nSteps
        var xia = xi.toDouble * w / nSteps
        var invB = !ok(i - 1); var invA = !ok(i)
        var iter = 0
        while ((invB || invA || xob * xoa < 0.0) && iter < 16) {
          val mx = (xib + xia) / 2
          val my = yi.toDouble * h / nSteps
          t.forward(mx, my) match {
            case Some((tx, ty)) =>
              fold(tx, ty)
              if (invB || xob * tx < 0) { invA = false; xia = (xib + xia) / 2; xoa = tx }
              else { invB = false; xob = tx; xib = (xib + xia) / 2 }
            case None =>
              if (invB) xib = (xib + xia) / 2
              else if (invA) xia = (xib + xia) / 2
              else iter = 16
          }
          iter += 1
        }
      }
      if (ok(i)) fold(xs(i), ys(i))
      i += 1
    }
    if (!got) return None

    var dX = 0.0; var dY = 0.0
    if (ok(0) && ok(n - 1)) { dX = xs(n - 1) - xs(0); dY = ys(n - 1) - ys(0) }
    if (dX == 0.0 || dY == 0.0) { dX = maxX - minX; dY = maxY - minY }
    val diag = math.sqrt(dX * dX + dY * dY)
    var psX = diag / math.sqrt(w.toDouble * w + h.toDouble * h)
    var psY = psX
    val pxD = (maxX - minX) / psX
    val lnD = (maxY - minY) / psY
    val pixels = if (roundUp) math.ceil(pxD - 1e-5).toInt else (pxD + 0.5).toInt
    val lines = if (roundUp) math.ceil(lnD - 1e-5).toInt else (lnD + 0.5).toInt
    if (pixels <= 0 || lines <= 0) return None

    val ratios = Array(0.0, 0.001, 0.010, 0.100, 1.000)
    // shrink X pixel size until the right border is not fully outside
    var ri = 0
    var done = false
    while (!done && ri < ratios.length) {
      val tryPs = psX - psX * ratios(ri) / pixels
      if (!mustAdjustBorder(t, right = true, minX, maxY, pixels, lines, tryPs, psY)) {
        psX = tryPs; done = true
      }
      ri += 1
    }
    ri = 0; done = false
    while (!done && ri < ratios.length) {
      val tryPs = psY - psY * ratios(ri) / lines
      if (!mustAdjustBorder(t, right = false, minX, maxY, pixels, lines, psX, tryPs)) {
        psY = tryPs; done = true
      }
      ri += 1
    }

    maxX = minX + pixels * psX
    minY = maxY - lines * psY
    Some(Result(Array(minX, psX, 0.0, maxY, 0.0, -psY), pixels, lines,
      Array(minX, minY, maxX, maxY)))
  }

  /** 21 roundtrip probes along the right border column (or bottom row);
    * true when ALL probes are bad — only then is the size shrunk. */
  private def mustAdjustBorder(t: Transformer2D, right: Boolean,
                               minX: Double, maxY: Double, pixels: Int, lines: Int,
                               psX: Double, psY: Double): Boolean = {
    val maxXOut = minX + pixels * psX
    val minYOut = maxY - lines * psY
    var bad = 0; var cnt = 0
    var r = 0.0
    while (r <= 1.01) {
      val ratio = if (r > 0.99) 1.0 else r
      val ex = if (right) maxXOut else minX + psX * ratio * pixels
      val ey = if (right) maxY - psY * ratio * lines else minYOut
      val round = t.inverse(ex, ey).flatMap { case (px, py) => t.forward(px, py) }
      round match {
        case Some((bx, by)) =>
          if (math.abs(bx - ex) > psX || math.abs(by - ey) > psY) bad += 1
        case None => bad += 1
      }
      cnt += 1
      r += 0.05
    }
    bad == cnt
  }

  private def transformAll(t: Transformer2D, xs: Array[Double], ys: Array[Double],
                           ok: Array[Boolean]): Int = {
    var failed = 0
    var i = 0
    while (i < xs.length) {
      t.forward(xs(i), ys(i)) match {
        case Some((x, y)) => xs(i) = x; ys(i) = y; ok(i) = true
        case None => ok(i) = false; failed += 1
      }
      i += 1
    }
    failed
  }

  private def transformAllInv(t: Transformer2D, xs: Array[Double], ys: Array[Double],
                              ok: Array[Boolean]): Int = {
    var failed = 0
    var i = 0
    while (i < xs.length) {
      t.inverse(xs(i), ys(i)) match {
        case Some((x, y)) => xs(i) = x; ys(i) = y; ok(i) = true
        case None => ok(i) = false; failed += 1
      }
      i += 1
    }
    failed
  }
}
