package graft.core

/** Projective (homography) transformer — the reference's 9-coefficient
  * perspective analog of the affine geotransform.
  *
  * Behavioral reference: alg/gdal_homography.cpp —
  *  - apply (:535-595 GDALApplyHomography): geoX = (h0 + P·h1 + L·h2)/w,
  *    geoY = (h3 + P·h4 + L·h5)/w with w = h6 + P·h7 + L·h8, failing on
  *    |w| < 1e-15;
  *  - invert (:426-512 GDALInvHomography): no-rotation fast path, then
  *    adjoint/determinant with the |det| ≤ 1e-10·magnitude² singularity
  *    guard;
  *  - compose (:333-375 GDALComposeHomographies);
  *  - fit (:141-330 GDALGCPsToHomography): < 4 GCPs falls back to the
  *    affine GDALGCPsToGeoTransform fit with (h6,h7,h8) = (1,0,0);
  *    otherwise source and target ranges are normalized to [0,1], the
  *    9-parameter least-squares normal system AᵀA h = e₆ (rank-8 system
  *    closed by the extra equation h₆ = 1) is solved, the normalized
  *    solution must map the unit square to a convex quadrilateral
  *    (cross12·cross23 > 0), and the result is composed with the
  *    normalization homographies.
  *
  * The fit runs once on the driver (GCP sets are O(10²) control points,
  * like the reference's in-memory arrays); the 9 fitted doubles ride
  * broadcast inside a codegen'd per-row expression, so transforming a
  * planet-scale point layer is an embarrassingly parallel map.
  */
object Homography {

  final case class Both(fwd: Array[Double], inv: Array[Double]) {
    def toGeo(px: Double, py: Double): (Double, Double) = apply(fwd, px, py)
    def toPixel(gx: Double, gy: Double): (Double, Double) = apply(inv, gx, gy)
  }

  /** Apply h to (x, y). Returns (NaN, NaN) when the projective weight w
    * vanishes (the reference's per-point FALSE success flag). */
  def apply(h: Array[Double], x: Double, y: Double): (Double, Double) = {
    val w = h(6) + x * h(7) + y * h(8)
    if (math.abs(w) < 1e-15) (Double.NaN, Double.NaN)
    else ((h(0) + x * h(1) + y * h(2)) / w, (h(3) + x * h(4) + y * h(5)) / w)
  }

  /** Invert a homography; None when numerically singular. */
  def invert(h: Array[Double]): Option[Array[Double]] = {
    // no-rotation fast path (axis-aligned affine) avoiding the determinant
    if (h(2) == 0.0 && h(4) == 0.0 && h(1) != 0.0 && h(5) != 0.0 &&
        h(7) == 0.0 && h(8) == 0.0 && h(6) != 0.0) {
      return Some(Array(
        -h(0) / h(1) / h(6), 1.0 / h(1), 0.0,
        -h(3) / h(5) / h(6), 0.0, 1.0 / h(5),
        1.0 / h(6), 0.0, 0.0))
    }
    val det = h(1) * h(5) * h(6) - h(2) * h(4) * h(6) +
      h(2) * h(3) * h(7) - h(0) * h(5) * h(7) +
      h(0) * h(4) * h(8) - h(1) * h(3) * h(8)
    val mag = math.max(math.max(math.abs(h(1)), math.abs(h(2))),
      math.max(math.abs(h(4)), math.abs(h(5))))
    if (math.abs(det) <= 1e-10 * mag * mag) return None
    val id = 1.0 / det
    val o = new Array[Double](9)
    o(1) = (h(5) * h(6) - h(3) * h(8)) * id
    o(4) = (h(3) * h(7) - h(4) * h(6)) * id
    o(7) = (h(4) * h(8) - h(5) * h(7)) * id
    o(2) = (h(0) * h(8) - h(2) * h(6)) * id
    o(5) = (h(1) * h(6) - h(0) * h(7)) * id
    o(8) = (h(2) * h(7) - h(1) * h(8)) * id
    o(0) = (h(2) * h(3) - h(0) * h(5)) * id
    o(3) = (h(0) * h(4) - h(1) * h(3)) * id
    o(6) = (h(1) * h(5) - h(2) * h(4)) * id
    Some(o)
  }

  /** Compose: the result applies h1 first, then h2. */
  def compose(h1: Array[Double], h2: Array[Double]): Array[Double] = {
    val o = new Array[Double](9)
    o(1) = h2(1) * h1(1) + h2(2) * h1(4) + h2(0) * h1(7)
    o(2) = h2(1) * h1(2) + h2(2) * h1(5) + h2(0) * h1(8)
    o(0) = h2(1) * h1(0) + h2(2) * h1(3) + h2(0) * h1(6)
    o(4) = h2(4) * h1(1) + h2(5) * h1(4) + h2(3) * h1(7)
    o(5) = h2(4) * h1(2) + h2(5) * h1(5) + h2(3) * h1(8)
    o(3) = h2(4) * h1(0) + h2(5) * h1(3) + h2(3) * h1(6)
    o(7) = h2(7) * h1(1) + h2(8) * h1(4) + h2(6) * h1(7)
    o(8) = h2(7) * h1(2) + h2(8) * h1(5) + h2(6) * h1(8)
    o(6) = h2(7) * h1(0) + h2(8) * h1(3) + h2(6) * h1(6)
    o
  }

  /** Least-squares homography from GCPs (pixel, line) → (geoX, geoY).
    * None on degenerate geometry, a singular system, or a fit whose
    * normalized map folds the unit square (non-convex image). Fewer than
    * 4 GCPs falls back to the affine fit with (h6,h7,h8) = (1,0,0). */
  def fromGcps(px: Array[Double], py: Array[Double],
               gx: Array[Double], gy: Array[Double]): Option[Array[Double]] = {
    val n = px.length
    if (n < 4) {
      return GcpPoly.gcpsToGeoTransform(px, py, gx, gy)
        .map(gt => Array(gt(0), gt(1), gt(2), gt(3), gt(4), gt(5), 1.0, 0.0, 0.0))
    }
    var minP = px(0); var maxP = px(0); var minL = py(0); var maxL = py(0)
    var minX = gx(0); var maxX = gx(0); var minY = gy(0); var maxY = gy(0)
    var i = 1
    while (i < n) {
      minP = math.min(minP, px(i)); maxP = math.max(maxP, px(i))
      minL = math.min(minL, py(i)); maxL = math.max(maxL, py(i))
      minX = math.min(minX, gx(i)); maxX = math.max(maxX, gx(i))
      minY = math.min(minY, gy(i)); maxY = math.max(maxY, gy(i))
      i += 1
    }
    val eps = 1e-12
    if (math.abs(maxP - minP) < eps || math.abs(maxL - minL) < eps ||
        math.abs(maxX - minX) < eps || math.abs(maxY - minY) < eps) return None

    val plNorm = Array(-minP / (maxP - minP), 1.0 / (maxP - minP), 0.0,
      -minL / (maxL - minL), 0.0, 1.0 / (maxL - minL), 1.0, 0.0, 0.0)
    val geoNorm = Array(-minX / (maxX - minX), 1.0 / (maxX - minX), 0.0,
      -minY / (maxY - minY), 0.0, 1.0 / (maxY - minY), 1.0, 0.0, 0.0)
    val invGeoNorm = invert(geoNorm).getOrElse(return None)

    // normal system AᵀA·h = e6 over normalized coords; the h6 = 1 row
    // closes the rank-8 homogeneous system
    val ata = new Array[Double](81)
    val rhs = new Array[Double](9)
    rhs(6) = 1.0
    ata(6 * 9 + 6) = 1.0
    i = 0
    while (i < n) {
      val (p, l) = apply(plNorm, px(i), py(i))
      val (x, y) = apply(geoNorm, gx(i), gy(i))
      if (p.isNaN || x.isNaN) return None
      val ax = Array(1.0, p, l, 0.0, 0.0, 0.0, -x, -x * p, -x * l)
      val ay = Array(0.0, 0.0, 0.0, 1.0, p, l, -y, -y * p, -y * l)
      var j = 0
      while (j < 9) {
        var k = 0
        while (k < 9) {
          ata(j * 9 + k) += ax(j) * ax(k) + ay(j) * ay(k)
          k += 1
        }
        j += 1
      }
      i += 1
    }
    if (!Georef.solveInPlace(ata, 9, rhs, 1)) return None
    val hNorm = rhs
    if (math.abs(hNorm(6)) < 1e-15) return None

    // the normalized map must keep the unit square convex: the diagonal
    // vector v2 must lie between the edge vectors v1 and v3
    val xs = new Array[Double](4); val ys = new Array[Double](4)
    val ux = Array(0.0, 1.0, 1.0, 0.0); val uy = Array(0.0, 0.0, 1.0, 1.0)
    i = 0
    while (i < 4) {
      val (cx, cy) = apply(hNorm, ux(i), uy(i))
      if (cx.isNaN) return None
      xs(i) = cx; ys(i) = cy
      i += 1
    }
    i = 3
    while (i >= 0) { xs(i) -= xs(0); ys(i) -= ys(0); i -= 1 }
    val cross12 = xs(1) * ys(2) - xs(2) * ys(1)
    val cross23 = xs(2) * ys(3) - xs(3) * ys(2)
    if (cross12 * cross23 <= 0.0) return None

    Some(compose(compose(plNorm, hNorm), invGeoNorm))
  }

  /** Fit both directions: the forward least-squares homography and its
    * exact projective inverse (the reference keeps padfForward +
    * padfReverse in HomographyTransformInfo). */
  def fitBoth(px: Array[Double], py: Array[Double],
              gx: Array[Double], gy: Array[Double]): Option[Both] =
    for {
      fwd <- fromGcps(px, py, gx, gy)
      inv <- invert(fwd)
    } yield Both(fwd, inv)
}
