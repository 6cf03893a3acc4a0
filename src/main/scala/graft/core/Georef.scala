package graft.core

/** GCP-based georeferencing transformers: polynomial (orders 1-3), thin
  * plate spline, and RPC rational-polynomial — the reference transformer
  * family a raster falls back to when it has control points instead of a
  * geotransform.
  *
  * Behavioral references:
  *  - polynomial: alg/gdal_crs.cpp — term basis and evaluation order per
  *    CRS_georef (:608-666), mean-centered least-squares fit per
  *    calccoef/calcls (:720-941), forward+inverse fitted independently
  *    (CRS_compute_georef_equations :675-717), 2-GCP synthesized-corner
  *    special case (:223-238);
  *  - TPS: alg/thinplatespline.cpp — basis U = d²·ln d² (:175-182),
  *    (n+3)×(n+3) interpolation system with affine side conditions and
  *    mean-centering (solve :424-619), evaluation per get_point (:621);
  *  - RPC: alg/gdal_rpc.cpp — 20-term cubic numerator/denominator in
  *    normalized (long,lat,height) (RPCComputeTerms :193-217), even/odd
  *    split summation (RPCEvaluate :double loop), iterative inverse from a
  *    linear initial map (RPCInverseTransformPoint :1130-1320);
  *  - affine-from-GCPs: gcore/gdal_misc.cpp GDALGCPsToGeoTransform
  *    (:3155+) incl. the 2-GCP axis-aligned and 4-corner special cases.
  *
  * The solves are tiny (GCP counts are O(10²) by nature) and run on the
  * driver once per layer; the fitted coefficient payload is a few hundred
  * doubles broadcast into per-row expressions — the distributed cost is
  * pure codegen'd arithmetic per point.
  */
object Georef {

  /** Solve A·X = B in place (A: n×n row-major, B: n×m row-major) by
    * Gaussian elimination with partial pivoting. Returns false when A is
    * numerically singular; A and B are clobbered, X lands in B. */
  def solveInPlace(a: Array[Double], n: Int, b: Array[Double], m: Int): Boolean = {
    var col = 0
    while (col < n) {
      // pivot
      var piv = col
      var best = math.abs(a(col * n + col))
      var r = col + 1
      while (r < n) {
        val v = math.abs(a(r * n + col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (best <= 1e-300) return false
      if (piv != col) {
        var j = 0
        while (j < n) { val t = a(col * n + j); a(col * n + j) = a(piv * n + j); a(piv * n + j) = t; j += 1 }
        j = 0
        while (j < m) { val t = b(col * m + j); b(col * m + j) = b(piv * m + j); b(piv * m + j) = t; j += 1 }
      }
      val d = a(col * n + col)
      r = col + 1
      while (r < n) {
        val f = a(r * n + col) / d
        if (f != 0.0) {
          var j = col
          while (j < n) { a(r * n + j) -= f * a(col * n + j); j += 1 }
          j = 0
          while (j < m) { b(r * m + j) -= f * b(col * m + j); j += 1 }
        }
        r += 1
      }
      col += 1
    }
    // back substitution
    var row = n - 1
    while (row >= 0) {
      var j = 0
      while (j < m) {
        var s = b(row * m + j)
        var k = row + 1
        while (k < n) { s -= a(row * n + k) * b(k * m + j); k += 1 }
        b(row * m + j) = s / a(row * n + row)
        j += 1
      }
      row -= 1
    }
    true
  }
}

/** Polynomial GCP transformer, orders 1-3 (alg/gdal_crs.cpp). */
object GcpPoly {

  /** Coefficient count for a total-degree-`order` bivariate polynomial:
    * 3 / 6 / 10 (gdal_crs.cpp MAXORDER = 3). */
  def nCoeffs(order: Int): Int = (order + 1) * (order + 2) / 2

  /** One fitted direction: centered source coords -> target coords.
    * Term basis and evaluation order mirror CRS_georef (gdal_crs.cpp:608):
    * [1, e, n, e², en, n², e³, e²n, en², n³]. */
  final case class Fit(order: Int, xMean: Double, yMean: Double,
                       ex: Array[Double], ny: Array[Double]) {
    def apply(x0: Double, y0: Double): (Double, Double) = {
      val e1 = x0 - xMean
      val n1 = y0 - yMean
      order match {
        case 1 =>
          (ex(0) + ex(1) * e1 + ex(2) * n1,
           ny(0) + ny(1) * e1 + ny(2) * n1)
        case 2 =>
          val e2 = e1 * e1; val n2 = n1 * n1; val en = e1 * n1
          (ex(0) + ex(1) * e1 + ex(2) * n1 + ex(3) * e2 + ex(4) * en + ex(5) * n2,
           ny(0) + ny(1) * e1 + ny(2) * n1 + ny(3) * e2 + ny(4) * en + ny(5) * n2)
        case _ =>
          val e2 = e1 * e1; val en = e1 * n1; val n2 = n1 * n1
          val e3 = e1 * e2; val e2n = e2 * n1; val en2 = e1 * n2; val n3 = n1 * n2
          (ex(0) + ex(1) * e1 + ex(2) * n1 + ex(3) * e2 + ex(4) * en + ex(5) * n2 +
             ex(6) * e3 + ex(7) * e2n + ex(8) * en2 + ex(9) * n3,
           ny(0) + ny(1) * e1 + ny(2) * n1 + ny(3) * e2 + ny(4) * en + ny(5) * n2 +
             ny(6) * e3 + ny(7) * e2n + ny(8) * en2 + ny(9) * n3)
      }
    }
  }

  /** Forward (pixel->geo) and inverse (geo->pixel) fits, each its own
    * least-squares solve (CRS_compute_georef_equations). */
  final case class Both(fwd: Fit, inv: Fit) {
    def toGeo(px: Double, py: Double): (Double, Double) = fwd(px, py)
    def toPixel(gx: Double, gy: Double): (Double, Double) = inv(gx, gy)
  }

  private def termVal(i: Int, e: Double, n: Double): Double = i match {
    case 0 => 1.0
    case 1 => e
    case 2 => n
    case 3 => e * e
    case 4 => e * n
    case 5 => n * n
    case 6 => e * e * e
    case 7 => e * e * n
    case 8 => e * n * n
    case _ => n * n * n
  }

  /** Least-squares fit of one direction over the control points, with the
    * reference's mean-centering of the source axis for conditioning
    * (calccoef uses x_mean/y_mean; normal equations per calcls, which also
    * covers the exactdet square case). */
  def fit(srcX: Array[Double], srcY: Array[Double],
          dstX: Array[Double], dstY: Array[Double], order: Int): Fit = {
    val n = srcX.length
    var xm = 0.0; var ym = 0.0
    var i = 0
    while (i < n) { xm += srcX(i); ym += srcY(i); i += 1 }
    fitWithMeans(srcX, srcY, dstX, dstY, order, xm / n, ym / n)
  }

  /** `fit` with the centering means supplied by the caller — the refine
    * loop (remove_outliers, gdal_crs.cpp:1092) keeps the FULL input set's
    * means fixed across refits over shrinking GCP subsets. */
  def fitWithMeans(srcX: Array[Double], srcY: Array[Double],
                   dstX: Array[Double], dstY: Array[Double], order: Int,
                   xm: Double, ym: Double): Fit = {
    require(order >= 1 && order <= 3, s"order must be 1..3, got $order")
    val n = srcX.length
    val nc = nCoeffs(order)
    require(n >= nc, s"need >= $nc GCPs for order $order, got $n")
    var i = 0
    // normal equations: (Tᵀ T) c = Tᵀ d, assembled directly
    val ata = new Array[Double](nc * nc)
    val atb = new Array[Double](nc * 2)
    i = 0
    while (i < n) {
      val e = srcX(i) - xm
      val nn = srcY(i) - ym
      var r = 0
      while (r < nc) {
        val tr = termVal(r, e, nn)
        var c = 0
        while (c < nc) { ata(r * nc + c) += tr * termVal(c, e, nn); c += 1 }
        atb(r * 2) += tr * dstX(i)
        atb(r * 2 + 1) += tr * dstY(i)
        r += 1
      }
      i += 1
    }
    require(Georef.solveInPlace(ata, nc, atb, 2),
      "GCP polynomial fit is singular (collinear or duplicate control points)")
    val ex = new Array[Double](nc); val ny = new Array[Double](nc)
    i = 0
    while (i < nc) { ex(i) = atb(i * 2); ny(i) = atb(i * 2 + 1); i += 1 }
    Fit(order, xm, ym, ex, ny)
  }

  /** Fit both directions. With exactly 2 GCPs at order 1 the reference
    * synthesizes a third corner assuming the two form opposite corners of
    * an axis-aligned rectangle (gdal_crs.cpp:223-238) — mirrored here. */
  def fitBoth(px: Array[Double], py: Array[Double],
              gx: Array[Double], gy: Array[Double], order: Int): Both = {
    var (ppx, ppy, ggx, ggy) = (px, py, gx, gy)
    if (px.length == 2 && order == 1 && gx(0) != gx(1) && gy(0) != gy(1)) {
      ppx = Array(px(0), px(1), px(1))
      ppy = Array(py(0), py(1), py(0))
      ggx = Array(gx(0), gx(1), gx(1))
      ggy = Array(gy(0), gy(1), gy(0))
    }
    Both(fit(ppx, ppy, ggx, ggy, order), fit(ggx, ggy, ppx, ppy, order))
  }

  /** Outcome of a refine run: surviving input indices (input order),
    * dropped indices (drop order), and the final two-direction fit. */
  final case class Refined(kept: Array[Int], dropped: Array[Int], both: Both)

  /** GDALCreateGCPRefineTransformer — `gdalwarp -refine_gcps`
    * (alg/gdal_crs.cpp:365 → remove_outliers:1092): fit order-`order`
    * polynomials, then, while more than `minimumGcps` GCPs survive, drop
    * the single worst-forward-residual GCP whose residual is at or above
    * `tolerance` and refit both directions; stop when no residual clears
    * the tolerance. Reference details mirrored exactly: the centering
    * means are those of the FULL input set and stay fixed across refits
    * (remove_outliers computes x1_mean/x2_mean once, before the loop);
    * residuals below FLT_EPSILON count as zero (worst_outlier:1068); ties
    * keep the first maximum (strict `>` scan); `minimumGcps = -1` takes
    * the reference default (order+1)(order+2)/2 + 1
    * (GDALCreateGCPTransformerEx:183). */
  def refine(px: Array[Double], py: Array[Double],
             gx: Array[Double], gy: Array[Double],
             order: Int, tolerance: Double, minimumGcps: Int = -1): Refined = {
    require(tolerance >= 0.0, "refine tolerance may not be negative")
    val minG = if (minimumGcps == -1) nCoeffs(order) + 1 else minimumGcps
    val n = px.length
    var x1m = 0.0; var y1m = 0.0; var x2m = 0.0; var y2m = 0.0
    var i = 0
    while (i < n) {
      x1m += px(i); y1m += py(i); x2m += gx(i); y2m += gy(i); i += 1
    }
    x1m /= n; y1m /= n; x2m /= n; y2m /= n
    val live = scala.collection.mutable.ArrayBuffer.range(0, n)
    val dropped = scala.collection.mutable.ArrayBuffer.empty[Int]
    def sub(a: Array[Double]): Array[Double] = live.map(a).toArray
    def fitPair(): Both = Both(
      fitWithMeans(sub(px), sub(py), sub(gx), sub(gy), order, x1m, y1m),
      fitWithMeans(sub(gx), sub(gy), sub(px), sub(py), order, x2m, y2m))
    var both = fitPair()
    var go = true
    while (go && live.length > minG) {
      var worstPos = -1
      var worstRes = -1.0
      var k = 0
      while (k < live.length) {
        val j = live(k)
        val (tx, ty) = both.fwd(px(j), py(j))
        val dx = tx - gx(j); val dy = ty - gy(j)
        var r = math.sqrt(dx * dx + dy * dy)
        if (r < 1.19209290e-7) r = 0.0
        if (r > worstRes && r >= tolerance) { worstRes = r; worstPos = k }
        k += 1
      }
      if (worstPos == -1) go = false
      else {
        dropped += live.remove(worstPos)
        both = fitPair()
      }
    }
    Refined(live.toArray, dropped.toArray, both)
  }

  /** First-order fit as an affine geotransform — GDALGCPsToGeoTransform
    * (gcore/gdal_misc.cpp:3155). Returns [gx0, dgx/dpx, dgx/dpy, gy0,
    * dgy/dpx, dgy/dpy] or None when under-determined. Mirrors the 2-GCP
    * axis-aligned special case; the general path is the order-1 fit
    * re-expressed at origin 0. */
  def gcpsToGeoTransform(px: Array[Double], py: Array[Double],
                         gx: Array[Double], gy: Array[Double]): Option[Array[Double]] = {
    val n = px.length
    if (n < 2) return None
    if (n == 2) {
      if (px(1) == px(0) || py(1) == py(0)) return None
      val g1 = (gx(1) - gx(0)) / (px(1) - px(0))
      val g5 = (gy(1) - gy(0)) / (py(1) - py(0))
      return Some(Array(gx(0) - px(0) * g1, g1, 0.0, gy(0) - py(0) * g5, 0.0, g5))
    }
    val f = fit(px, py, gx, gy, 1)
    // un-center: value at pixel origin and unit steps
    val (x00, y00) = f(0.0, 0.0)
    val (x10, y10) = f(1.0, 0.0)
    val (x01, y01) = f(0.0, 1.0)
    Some(Array(x00, x10 - x00, x01 - x00, y00, y10 - y00, y01 - y00))
  }
}

/** Thin plate spline transformer (alg/thinplatespline.cpp). */
object Tps {

  /** U(p, q) on SQUARED distance d²: d²·ln d², 0 at coincident points
    * (VizGeorefSpline2DBase_func:175 — note the reference's `dist` is the
    * squared distance, so this is 2·r²·ln r in classic TPS notation). */
  @inline def base(dx: Double, dy: Double): Double = {
    val d2 = dx * dx + dy * dy
    if (d2 != 0.0) d2 * math.log(d2) else 0.0
  }

  /** One fitted direction. xs/ys are the mean-centered control sources;
    * coefX/coefY are length n+3: [a0, ax, ay, w_0..w_{n-1}] per target
    * axis (thinplatespline.cpp solve() row layout). */
  final case class Fit(xMean: Double, yMean: Double,
                       xs: Array[Double], ys: Array[Double],
                       coefX: Array[Double], coefY: Array[Double]) {
    def apply(x0: Double, y0: Double): (Double, Double) = {
      val px = x0 - xMean
      val py = y0 - yMean
      var vx = coefX(0) + coefX(1) * px + coefX(2) * py
      var vy = coefY(0) + coefY(1) * px + coefY(2) * py
      var i = 0
      while (i < xs.length) {
        val u = base(px - xs(i), py - ys(i))
        vx += coefX(i + 3) * u
        vy += coefY(i + 3) * u
        i += 1
      }
      (vx, vy)
    }
  }

  final case class Both(fwd: Fit, inv: Fit) {
    def toGeo(px: Double, py: Double): (Double, Double) = fwd(px, py)
    def toPixel(gx: Double, gy: Double): (Double, Double) = inv(gx, gy)
  }

  /** Interpolating TPS fit: (n+3)×(n+3) system — affine side conditions
    * Σw = Σw·x = Σw·y = 0 in rows/cols 0-2, kernel matrix in the rest,
    * sources mean-centered (solve(), thinplatespline.cpp:540-619). */
  def fit(srcX: Array[Double], srcY: Array[Double],
          dstX: Array[Double], dstY: Array[Double]): Fit = {
    val n = srcX.length
    require(n >= 3, s"TPS needs >= 3 control points, got $n")
    var xm = 0.0; var ym = 0.0
    var i = 0
    while (i < n) { xm += srcX(i); ym += srcY(i); i += 1 }
    xm /= n; ym /= n
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    i = 0
    while (i < n) { xs(i) = srcX(i) - xm; ys(i) = srcY(i) - ym; i += 1 }
    val ne = n + 3
    val a = new Array[Double](ne * ne)
    val b = new Array[Double](ne * 2)
    i = 0
    while (i < n) {
      a(0 * ne + (i + 3)) = 1.0
      a(1 * ne + (i + 3)) = xs(i)
      a(2 * ne + (i + 3)) = ys(i)
      a((i + 3) * ne + 0) = 1.0
      a((i + 3) * ne + 1) = xs(i)
      a((i + 3) * ne + 2) = ys(i)
      b((i + 3) * 2) = dstX(i)
      b((i + 3) * 2 + 1) = dstY(i)
      var j = i
      while (j < n) {
        val u = base(xs(i) - xs(j), ys(i) - ys(j))
        a((i + 3) * ne + (j + 3)) = u
        a((j + 3) * ne + (i + 3)) = u
        j += 1
      }
      i += 1
    }
    require(Georef.solveInPlace(a, ne, b, 2),
      "TPS system is singular (duplicate control points)")
    val cx = new Array[Double](ne); val cy = new Array[Double](ne)
    i = 0
    while (i < ne) { cx(i) = b(i * 2); cy(i) = b(i * 2 + 1); i += 1 }
    Fit(xm, ym, xs, ys, cx, cy)
  }

  def fitBoth(px: Array[Double], py: Array[Double],
              gx: Array[Double], gy: Array[Double]): Both =
    Both(fit(px, py, gx, gy), fit(gx, gy, px, py))
}

/** RPC (rational polynomial coefficients) transformer (alg/gdal_rpc.cpp).
  * Forward = (long, lat, height) -> (pixel aka sample, line); inverse is
  * iterative from a linear initial map. */
final case class Rpc(lineOff: Double, sampOff: Double,
                     latOff: Double, longOff: Double, heightOff: Double,
                     lineScale: Double, sampScale: Double,
                     latScale: Double, longScale: Double, heightScale: Double,
                     lineNum: Array[Double], lineDen: Array[Double],
                     sampNum: Array[Double], sampDen: Array[Double]) {
  require(lineNum.length == 20 && lineDen.length == 20 &&
    sampNum.length == 20 && sampDen.length == 20, "RPC coefficient arrays must have 20 terms")
}

object Rpc {

  /** The 20 cubic terms in normalized (L=long, P=lat, H=height), exactly
    * the reference's layout (gdal_rpc.cpp RPCComputeTerms:193-217). */
  def terms(l: Double, p: Double, h: Double, t: Array[Double]): Unit = {
    t(0) = 1.0
    t(1) = l
    t(2) = p
    t(3) = h
    t(4) = l * p
    t(5) = l * h
    t(6) = p * h
    t(7) = l * l
    t(8) = p * p
    t(9) = h * h
    t(10) = l * p * h
    t(11) = l * l * l
    t(12) = l * p * p
    t(13) = l * h * h
    t(14) = l * l * p
    t(15) = p * p * p
    t(16) = p * h * h
    t(17) = l * l * h
    t(18) = p * p * h
    t(19) = h * h * h
  }

  /** Even/odd split summation, matching RPCEvaluate's operation order
    * bit-for-bit (two accumulators over i += 2, then one final add). */
  def evalPoly(t: Array[Double], c: Array[Double]): Double = {
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < 20) {
      s1 += t(i) * c(i)
      s2 += t(i + 1) * c(i + 1)
      i += 2
    }
    s1 + s2
  }

  /** (long, lat, height) -> (pixel, line), per RPCTransformPoint: dateline
    * wrap on the long offset, normalize, rational evaluate, denormalize. */
  // scratch for the 20 monomial terms: forward() is on the per-pixel hot
  // path of the RPC-driven warp (q161 evaluates it ~16× per refit), so the
  // term vector is reused per executor thread instead of allocated per call
  private val termScratch = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](20)
  }

  def forward(m: Rpc, lon: Double, lat: Double, h: Double): (Double, Double) = {
    var diffLong = lon - m.longOff
    if (diffLong < -270) diffLong += 360 else if (diffLong > 270) diffLong -= 360
    val l = diffLong / m.longScale
    val p = (lat - m.latOff) / m.latScale
    val hh = (h - m.heightOff) / m.heightScale
    val t = termScratch.get()
    terms(l, p, hh, t)
    val px = evalPoly(t, m.sampNum) / evalPoly(t, m.sampDen) * m.sampScale + m.sampOff
    val py = evalPoly(t, m.lineNum) / evalPoly(t, m.lineDen) * m.lineScale + m.lineOff
    (px, py)
  }

  /** (pixel, line) -> (long, lat) at a fixed height, the iterative scheme
    * of RPCInverseTransformPoint (:1130): start from a linear pixel→geo
    * map estimated at the model center, then correct by the back-projected
    * pixel error mapped through that linear map, up to `maxIter` rounds or
    * until the error drops under `pixErrThreshold` (reference default 0.1
    * px, 10 iterations without DEM). */
  def inverse(m: Rpc, pixel: Double, line: Double, h: Double,
              maxIter: Int = 10, pixErrThreshold: Double = 0.1): (Double, Double) = {
    // linear init: forward-difference the forward map at the center
    val dL = 0.1 * m.longScale
    val dP = 0.1 * m.latScale
    val (px0, py0) = forward(m, m.longOff, m.latOff, h)
    val (pxL, pyL) = forward(m, m.longOff + dL, m.latOff, h)
    val (pxP, pyP) = forward(m, m.longOff, m.latOff + dP, h)
    // Jacobian d(pixel,line)/d(long,lat) and its inverse
    val j00 = (pxL - px0) / dL; val j01 = (pxP - px0) / dP
    val j10 = (pyL - py0) / dL; val j11 = (pyP - py0) / dP
    val det = j00 * j11 - j01 * j10
    require(math.abs(det) > 1e-300, "degenerate RPC model (singular center Jacobian)")
    val i00 = j11 / det; val i01 = -j01 / det
    val i10 = -j10 / det; val i11 = j00 / det
    var lon = m.longOff + i00 * (pixel - px0) + i01 * (line - py0)
    var lat = m.latOff + i10 * (pixel - px0) + i11 * (line - py0)
    var iter = 0
    while (iter < maxIter) {
      val (bx, by) = forward(m, lon, lat, h)
      val ex = bx - pixel
      val ey = by - line
      if (math.abs(ex) < pixErrThreshold && math.abs(ey) < pixErrThreshold)
        return (lon, lat)
      lon -= i00 * ex + i01 * ey
      lat -= i10 * ex + i11 * ey
      iter += 1
    }
    (lon, lat)
  }
}
