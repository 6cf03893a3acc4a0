package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Suggested warp output vs alg/gdaltransformer.cpp
  * GDALSuggestedWarpOutput2 behavior. */
class WarpOutputSpec extends AnyFunSuite {

  private def affine(g0: Double, s: Double, g3: Double): WarpOutput.Transformer2D =
    WarpOutput.homographyTransformer(
      Array(g0, s, 0.0, g3, 0.0, -s, 1.0, 0.0, 0.0)).get

  test("square-pixel affine reproduces the source size and extent exactly") {
    val r = WarpOutput.suggest(40, 30, affine(10.25, 0.25, -5.5)).get
    assert(r.pixels == 40 && r.lines == 30)
    assert(r.gt.toSeq == Seq(10.25, 0.25, 0.0, -5.5, 0.0, -0.25))
    assert(r.extent.toSeq == Seq(10.25, -5.5 - 0.25 * 30, 10.25 + 0.25 * 40, -5.5))
  }

  test("south-up source flips to a north-up suggestion of the same area") {
    // gt with positive g5 (south-up): y grows downward in geo space
    val t = WarpOutput.homographyTransformer(
      Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0)).get
    val r = WarpOutput.suggest(20, 10, t).get
    assert(r.pixels == 20 && r.lines == 10)
    assert(r.gt(3) == 10.0 && r.gt(5) == -1.0) // emitted north-up
  }

  test("anisotropic affine: one square pixel size from the diagonal") {
    // g1 = 2, |g5| = 1 on a 30x40 source: diag = sqrt(60² + 40²),
    // ps = diag/sqrt(30²+40²) = sqrt(5200)/50
    val t = WarpOutput.homographyTransformer(
      Array(0.0, 2.0, 0.0, 0.0, 0.0, -1.0, 1.0, 0.0, 0.0)).get
    val r = WarpOutput.suggest(30, 40, t).get
    // reference semantics: lines/pixels re-derived from the common size
    val ps = math.sqrt(60.0 * 60 + 40.0 * 40) / 50.0
    assert(math.abs(r.gt(1) - ps) < 1e-12)
    assert(r.pixels == (60.0 / ps + 0.5).toInt && r.lines == (40.0 / ps + 0.5).toInt)
  }

  test("a genuine homography bounds the projected quadrilateral") {
    val h = Array(2.0, 0.5, 0.25, -3.0, 0.125, 0.75, 1.0, 1.0 / 64, 1.0 / 128)
    val t = WarpOutput.homographyTransformer(h).get
    val r = WarpOutput.suggest(24, 24, t).get
    // corner images must lie inside the suggested extent up to the
    // half-pixel slack the reference's +0.5 size rounding introduces
    // (gdaltransformer.cpp:1141 then :1196 recomputes maxX/minY)
    for ((x, y) <- Seq((0, 0), (24, 0), (0, 24), (24, 24))) {
      val (gx, gy) = Homography.apply(h, x, y)
      assert(gx >= r.extent(0) - r.gt(1) && gx <= r.extent(2) + r.gt(1))
      assert(gy >= r.extent(1) - r.gt(1) && gy <= r.extent(3) + r.gt(1))
    }
    // and the suggested grid must cover a positive area with sane sizes
    assert(r.pixels > 0 && r.lines > 0 && r.gt(1) > 0 && r.gt(5) < 0)
  }

  test("extent crossing zero exercises the sign-change dichotomy unchanged") {
    // g0 < 0 < g0 + s·w: top-row samples change sign; for a monotone
    // affine the refinement must not widen the corner-exact bounds
    val r = WarpOutput.suggest(40, 30, affine(-2.5, 0.25, 3.0)).get
    assert(r.extent(0) == -2.5 && r.extent(2) == -2.5 + 0.25 * 40)
    assert(r.pixels == 40 && r.lines == 30)
  }

  test("degenerate transformer yields None") {
    assert(WarpOutput.homographyTransformer(
      Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0)).isEmpty)
  }
}
