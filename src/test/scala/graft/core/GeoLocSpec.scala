package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Geolocation-array transformer vs alg/gdalgeoloc.cpp behavior. */
class GeoLocSpec extends AnyFunSuite {

  /** 5×4 affine grid X = 10 + 2i + j, Y = 20 + i + 3j at unit step. */
  private def affine(): GeoLoc = {
    val gw = 5; val gh = 4
    val xs = new Array[Double](gw * gh); val ys = new Array[Double](gw * gh)
    for (j <- 0 until gh; i <- 0 until gw) {
      xs(j * gw + i) = 10.0 + 2 * i + j
      ys(j * gw + i) = 20.0 + i + 3 * j
    }
    GeoLoc(xs, ys, gw, gh, pixelOffset = 0.0, lineOffset = 0.0,
      pixelStep = 1.0, lineStep = 1.0)
  }

  test("bilinear interpolation of an affine grid is the affine map") {
    val g = affine()
    for (p <- Seq(0.0, 0.25, 1.5, 3.75); l <- Seq(0.0, 0.5, 2.25)) {
      val (x, y) = g.forward(p, l)
      assert(math.abs(x - (10 + 2 * p + l)) < 1e-12)
      assert(math.abs(y - (20 + p + 3 * l)) < 1e-12)
    }
  }

  test("closest-grid-square extension beyond right/bottom borders") {
    val g = affine()
    // beyond the right edge: iX clamps to gw-1, retreats one cell, and
    // the bilinear extrapolates the same affine
    val (x, y) = g.forward(4.5, 1.0)
    assert(math.abs(x - (10 + 2 * 4.5 + 1)) < 1e-12)
    assert(math.abs(y - (20 + 4.5 + 3)) < 1e-12)
    // beyond both edges (bottom-right corner retreat)
    val (x2, y2) = g.forward(4.25, 3.5)
    assert(math.abs(x2 - (10 + 2 * 4.25 + 3.5)) < 1e-12)
    assert(math.abs(y2 - (20 + 4.25 + 3 * 3.5)) < 1e-12)
  }

  test("offset/step convention maps raster coords into the geoloc grid") {
    val gw = 3; val gh = 3
    val xs = Array.tabulate(gw * gh)(k => (k % gw).toDouble)
    val ys = Array.tabulate(gw * gh)(k => (k / gw).toDouble)
    // arrays subsampled 4×: raster pixel 4i+2 hits geoloc node i exactly
    val g = GeoLoc(xs, ys, gw, gh, pixelOffset = 2.0, lineOffset = 2.0,
      pixelStep = 4.0, lineStep = 4.0)
    assert(g.forward(2.0, 2.0) == ((0.0, 0.0)))
    assert(g.forward(6.0, 2.0) == ((1.0, 0.0)))
    assert(g.forward(4.0, 6.0) == ((0.5, 1.0)))
  }

  test("exact inverse bilinear roundtrips an affine grid") {
    val g = affine()
    for (p <- Seq(0.25, 1.5, 3.75); l <- Seq(0.5, 1.0, 2.25)) {
      val (x, y) = g.forward(p, l)
      val Some((rp, rl)) = g.inverse(x, y)
      assert(math.abs(rp - p) < 1e-9 && math.abs(rl - l) < 1e-9, s"at ($p,$l)")
    }
  }

  test("inverse on a genuinely curvilinear grid (quadratic warp)") {
    val gw = 6; val gh = 6
    val xs = new Array[Double](gw * gh); val ys = new Array[Double](gw * gh)
    for (j <- 0 until gh; i <- 0 until gw) {
      xs(j * gw + i) = i + 0.05 * j * j
      ys(j * gw + i) = j + 0.03 * i * i
    }
    val g = GeoLoc(xs, ys, gw, gh, 0.0, 0.0, 1.0, 1.0)
    for (p <- Seq(0.5, 2.25, 4.5); l <- Seq(0.75, 3.5)) {
      val (x, y) = g.forward(p, l)
      val Some((rp, rl)) = g.inverse(x, y)
      // the roundtrip must re-project forward onto the same geo point
      val (fx, fy) = g.forward(rp, rl)
      assert(math.abs(fx - x) < 1e-9 && math.abs(fy - y) < 1e-9, s"at ($p,$l)")
    }
  }

  test("inverse returns None outside the grid's image") {
    assert(affine().inverse(0.0, 0.0).isEmpty)
    assert(affine().inverse(1000.0, 1000.0).isEmpty)
  }
}
