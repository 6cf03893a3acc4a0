package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Homography transformer vs alg/gdal_homography.cpp behavior. */
class HomographySpec extends AnyFunSuite {

  private val H = Array(2.0, 0.5, 0.25, -3.0, 0.125, 0.75, 1.0, 1.0 / 64, 1.0 / 128)

  private def grid(): (Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val px = new Array[Double](25); val py = new Array[Double](25)
    val gx = new Array[Double](25); val gy = new Array[Double](25)
    var k = 0
    while (k < 25) {
      px(k) = (k % 5) * 6.0; py(k) = (k / 5) * 6.0
      val (x, y) = Homography.apply(H, px(k), py(k))
      gx(k) = x; gy(k) = y
      k += 1
    }
    (px, py, gx, gy)
  }

  test("least-squares fit recovers an exactly-consistent projective map") {
    val (px, py, gx, gy) = grid()
    val fit = Homography.fromGcps(px, py, gx, gy).get
    // compare by action, not by coefficients (homographies are scale-free)
    for (x <- 0 to 24; y <- 0 to 24 by 3) {
      val (ex, ey) = Homography.apply(H, x, y)
      val (ax, ay) = Homography.apply(fit, x, y)
      assert(math.abs(ax - ex) < 1e-9 && math.abs(ay - ey) < 1e-9, s"at ($x,$y)")
    }
  }

  test("inverse roundtrips and matches the adjoint formula") {
    val inv = Homography.invert(H).get
    for (x <- 0 to 24 by 4; y <- 0 to 24 by 4) {
      val (gx, gy) = Homography.apply(H, x, y)
      val (rx, ry) = Homography.apply(inv, gx, gy)
      assert(math.abs(rx - x) < 1e-10 && math.abs(ry - y) < 1e-10)
    }
  }

  test("no-rotation fast path inverts an axis-aligned affine exactly") {
    val a = Array(10.0, 2.0, 0.0, -5.0, 0.0, 4.0, 1.0, 0.0, 0.0)
    val inv = Homography.invert(a).get
    val (rx, ry) = Homography.apply(inv, 10.0 + 2.0 * 3, -5.0 + 4.0 * 7)
    assert(rx == 3.0 && ry == 7.0)
  }

  test("compose applies h1 then h2") {
    val inv = Homography.invert(H).get
    val id = Homography.compose(H, inv)
    val (x, y) = Homography.apply(id, 5.0, 9.0)
    assert(math.abs(x - 5.0) < 1e-10 && math.abs(y - 9.0) < 1e-10)
  }

  test("fewer than 4 GCPs falls back to the affine geotransform fit") {
    val h = Homography.fromGcps(Array(0.0, 10.0), Array(0.0, 10.0),
      Array(100.0, 120.0), Array(50.0, 30.0)).get
    assert(h(6) == 1.0 && h(7) == 0.0 && h(8) == 0.0)
    val (gx, gy) = Homography.apply(h, 10.0, 0.0)
    assert(gx == 120.0 && gy == 50.0)
  }

  test("degenerate GCP geometry is rejected") {
    // all pixels on one column: pixel range collapses
    assert(Homography.fromGcps(Array(5.0, 5.0, 5.0, 5.0), Array(0.0, 1.0, 2.0, 3.0),
      Array(0.0, 1.0, 2.0, 3.0), Array(0.0, 1.0, 2.0, 3.0)).isEmpty)
  }

  test("a fold (non-convex image of the unit square) is rejected") {
    // swap two geo targets of a square so the image self-crosses
    val px = Array(0.0, 1.0, 1.0, 0.0); val py = Array(0.0, 0.0, 1.0, 1.0)
    val gx = Array(0.0, 1.0, 0.0, 1.0); val gy = Array(0.0, 0.0, 1.0, 1.0)
    assert(Homography.fromGcps(px, py, gx, gy).isEmpty)
  }

  test("vanishing projective weight yields NaN (per-point failure)") {
    val (x, _) = Homography.apply(Array(1.0, 1, 0, 0, 0, 1, 0.0, 0, 0), 0.0, 0.0)
    assert(x.isNaN)
  }
}
