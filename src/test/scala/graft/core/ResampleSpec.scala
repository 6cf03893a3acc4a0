package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Resampler breadth goldens (alg/gdalwarper.h:35-69 kernel set;
  * gcore/overview.cpp gauss/mode). Pattern follows autotest/alg/warp.py:
  * closed-form or maxdiff≤1 comparisons per kernel. */
class ResampleSpec extends AnyFunSuite {

  private def ramp(w: Int, h: Int): Raster =
    Raster(w, h, Array(Array.tabulate(w * h)(i => (i % w) * 2 + (i / w))))

  private def const(w: Int, h: Int, v: Int): Raster =
    Raster(w, h, Array(Array.fill(w * h)(v)))

  private val gtId = Array(0.0, 1.0, 0.0, 8.0, 0.0, -1.0)

  test("every kernel reproduces a constant raster under identity warp") {
    val src = const(8, 8, 137)
    Warp.Kernels.foreach { k =>
      val out = Warp.warp(src, gtId, 4326, gtId, 4326, 8, 8, k, nodata = -1)
      assert(out.bands(0).forall(_ == 137), s"kernel $k broke a constant")
    }
  }

  test("interpolating kernels reproduce a linear ramp within maxdiff <= 1") {
    val src = ramp(16, 16)
    val gt = Array(0.0, 1.0, 0.0, 16.0, 0.0, -1.0)
    Seq(Warp.Near, Warp.Bilinear, Warp.Cubic, Warp.CubicSpline, Warp.Lanczos).foreach { k =>
      val out = Warp.warp(src, gt, 4326, gt, 4326, 16, 16, k, nodata = -1)
      // interior only: edge-clamped taps bias boundary rows
      for (y <- 3 until 13; x <- 3 until 13) {
        val d = math.abs(out.bands(0)(y * 16 + x) - src.bands(0)(y * 16 + x))
        assert(d <= 1, s"kernel $k at ($x,$y): diff $d")
      }
    }
  }

  test("aggregate kernels over exact 2x2 blocks: closed-form statistics") {
    // 8x8 src; each 2x2 block holds {10, 20, 20, 30} (row-major)
    val b = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      b(y * 8 + x) = (y % 2, x % 2) match {
        case (0, 0) => 10
        case (0, 1) => 20
        case (1, 0) => 20
        case (1, 1) => 30
      }
    }
    val src = Raster(8, 8, Array(b))
    val srcGt = Array(0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
    val dstGt = Array(0.0, 2.0, 0.0, 8.0, 0.0, -2.0)
    def run(k: String): Int = {
      val out = Warp.warp(src, srcGt, 4326, dstGt, 4326, 4, 4, k, nodata = -1)
      val v = out.bands(0)(5) // interior dst pixel
      assert(out.bands(0).forall(_ == v), s"$k not uniform across blocks")
      v
    }
    assert(run(Warp.Average) == 20)
    assert(run(Warp.Min) == 10)
    assert(run(Warp.Max) == 30)
    assert(run(Warp.Sum) == 80)
    // sorted block {10,20,20,30}: med idx ceil(.5*4-1)=1 → 20;
    // q1 idx ceil(.25*4-1)=0 → 10; q3 idx ceil(.75*4-1)=2 → 20
    assert(run(Warp.Med) == 20)
    assert(run(Warp.Q1) == 10)
    assert(run(Warp.Q3) == 20)
    // mode: 20 reaches count 2 first
    assert(run(Warp.Mode) == 20)
    // rms = sqrt((100+400+400+900)/4) = sqrt(450) ≈ 21.2 → 21
    assert(run(Warp.Rms) == 21)
  }

  test("mode tie rule: first value to reach the max count wins") {
    val b = Array(
      7, 9, 0, 0,
      9, 7, 0, 0,
      0, 0, 0, 0,
      0, 0, 0, 0)
    val src = Raster(4, 4, Array(b))
    val srcGt = Array(0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    val dstGt = Array(0.0, 2.0, 0.0, 4.0, 0.0, -2.0)
    val out = Warp.warp(src, srcGt, 4326, dstGt, 4326, 2, 2, Warp.Mode, nodata = -1)
    // block {7,9,9,7}: 7 reaches count 2 at scan position 4 (after 9 does at 3)
    assert(out.bands(0)(0) == 9)
  }

  test("gauss overview: constant preserved; 3x3 anchored kernel computed exactly") {
    val c = Warp.downsample2xGauss(const(8, 8, 99))
    assert(c.bands(0).forall(_ == 99))
    // delta raster: single bright pixel at (1,1); dst (0,0) window covers
    // src [0..2]² with weights {1,2,1;2,4,2;1,2,1}/16 → 4/16 of 160 = 40
    val b = new Array[Int](64)
    b(1 * 8 + 1) = 160
    val g = Warp.downsample2xGauss(Raster(8, 8, Array(b)))
    assert(g.bands(0)(0) == 40)
    // dst (1,0): window anchored at src x=2: pixel (1,1) outside → 0
    assert(g.bands(0)(1) == 0)
  }

  test("mode overview picks block majority, tie → first-to-reach") {
    val b = Array(
      5, 5, 1, 2,
      5, 3, 2, 2,
      8, 9, 4, 4,
      9, 9, 4, 4)
    val m = Warp.downsample2xMode(Raster(4, 4, Array(b)))
    assert(m.bands(0).toSeq == Seq(5, 2, 9, 4))
  }

  test("lanczos overview: constant preserved, 2:1 ramp reproduced within 1") {
    val c = Warp.downsample2xLanczos(const(16, 16, 77))
    assert(c.bands(0).forall(_ == 77))
    val r = Raster(16, 16, Array(Array.tabulate(256)(i => (i % 16) * 8)))
    val d = Warp.downsample2xLanczos(r)
    // dst pixel x covers src [2x, 2x+2): ideal value = ramp at center
    for (y <- 1 until 7; x <- 1 until 7) {
      val ideal = (2 * x + 0.5) * 8
      val diff = math.abs(d.bands(0)(y * 8 + x) - ideal)
      assert(diff <= 1.0, s"lanczos overview at ($x,$y): $diff")
    }
  }

  test("edge-clipped gauss window renormalizes (no darkening at borders)") {
    val r = ramp(9, 9) // odd size forces clipped windows at right/bottom
    val g = Warp.downsample2xGauss(r)
    assert(g.w == 5 && g.h == 5)
    // border value derives only from in-bounds taps; sanity: within data range
    val mx = r.bands(0).max
    assert(g.bands(0).forall(v => v >= 0 && v <= mx))
  }
}
