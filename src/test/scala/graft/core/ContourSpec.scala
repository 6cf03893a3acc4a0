package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ContourSpec extends AnyFunSuite {
  private val idGt = Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

  test("horizontal ramp produces one straight vertical iso-line at the interpolated x") {
    // v = 10x on a 9x5 grid; level 45 crosses between x=4 (40) and x=5 (50)
    val band = Array.tabulate(45)(i => 10 * (i % 9))
    val lines = Contour.contours(band, 9, 5, idGt, Seq(45.0))
    assert(lines.length == 1)
    val l = lines.head
    assert(!l.closed)
    // crossing at pixel-center x = 4.5 + (45-40)/10 = 5.0
    val xs = l.coords.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }
    assert(xs.forall(x => math.abs(x - 5.0) < 1e-9), xs.mkString(","))
    // spans the full pixel-center extent (rows 0.5 .. h-0.5)
    val ys = l.coords.zipWithIndex.collect { case (v, i) if i % 2 == 1 => v }
    assert(math.abs(ys.min - 0.5) < 1e-9 && math.abs(ys.max - 4.5) < 1e-9)
  }

  test("a peak produces a closed ring containing the summit") {
    // cone: v = max(0, 80 - 10*chebyshev distance from center)
    val w = 11; val h = 11
    val band = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0, 80 - 10 * math.max(math.abs(x - 5), math.abs(y - 5)))
    }
    val lines = Contour.contours(band, w, h, idGt, Seq(45.0))
    assert(lines.length == 1)
    val l = lines.head
    assert(l.closed, "iso-line around a peak must close")
    // ring must wind around the summit (5.5, 5.5) in pixel-center space
    val ring = l.coords
    assert(Pip.inRing(ring, 5.5, 5.5))
    assert(!Pip.inRing(ring, 0.6, 0.6))
  }

  test("multiple levels produce nested rings") {
    val w = 11; val h = 11
    val band = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0, 80 - 10 * math.max(math.abs(x - 5), math.abs(y - 5)))
    }
    val lines = Contour.contours(band, w, h, idGt, Seq(35.0, 65.0))
    assert(lines.length == 2)
    val by = lines.map(l => l.level -> l).toMap
    // the 65 ring sits inside the 35 ring
    val inner = by(65.0).coords
    val outer = by(35.0).coords
    assert(Pip.inRing(outer, inner(0), inner(1)))
  }

  test("flat raster yields no contours at a non-crossing level") {
    val band = Array.fill(100)(7)
    assert(Contour.contours(band, 10, 10, idGt, Seq(50.0)).isEmpty)
  }

  test("geo transform is applied to output coordinates") {
    val band = Array.tabulate(45)(i => 10 * (i % 9))
    val gt = Array(100.0, 2.0, 0.0, 50.0, 0.0, -2.0)
    val lines = Contour.contours(band, 9, 5, gt, Seq(45.0))
    val xs = lines.head.coords.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }
    assert(xs.forall(x => math.abs(x - (100.0 + 2.0 * 5.0)) < 1e-9))
  }
}
