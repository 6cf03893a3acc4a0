package graft.core

import org.scalatest.funsuite.AnyFunSuite

class FocalSpec extends AnyFunSuite {

  private def plane(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  test("flat surface: slope 0, aspect flat-marker, uniform hillshade") {
    val b = plane(8, 8, (_, _) => 100)
    assert(Focal.slope(b, 8, 8, 1, 1).forall(_ == 0.0))
    assert(Focal.aspect(b, 8, 8, 1, 1).forall(_ == -9999.0))
    val hs = Focal.hillshade(b, 8, 8, 1, 1)
    assert(hs.distinct.length == 1)
    // flat: cang = sin(45°) → 254*0.7071+1 ≈ 181
    assert(math.abs(hs(0) - 181) <= 1)
  }

  test("east-dipping ramp has the analytic slope angle") {
    // z = 2x → dz/dx = 2 with ewRes=1: slope = atan(2) ≈ 63.43°
    val b = plane(9, 9, (x, _) => 2 * x)
    val s = Focal.slope(b, 9, 9, 1, 1)
    // interior pixels (edge-clamping distorts the border)
    for (y <- 1 to 7; x <- 1 to 7)
      assert(math.abs(s(y * 9 + x) - math.toDegrees(math.atan(2.0))) < 1e-9, s"($x,$y)")
    // aspect: surface rises to the east → faces west = 270°
    val a = Focal.aspect(b, 9, 9, 1, 1)
    assert(math.abs(a(4 * 9 + 4) - 270.0) < 1e-9)
  }

  test("north-facing ramp aspect is 0/360") {
    // z increases with y (southward in image coords) → faces north
    val b = plane(9, 9, (_, y) => 3 * y)
    val a = Focal.aspect(b, 9, 9, 1, 1)
    val v = a(4 * 9 + 4)
    assert(math.abs(v) < 1e-9 || math.abs(v - 360.0) < 1e-9, s"got $v")
  }

  test("hillshade brightens sun-facing slopes") {
    // sun from 315° (NW): a NW-facing ramp (rising to SE) is lit
    val nwFacing = plane(9, 9, (x, y) => 2 * (x + y))
    val seFacing = plane(9, 9, (x, y) => 2 * (16 - x - y))
    val lit = Focal.hillshade(nwFacing, 9, 9, 1, 1)(4 * 9 + 4)
    val shaded = Focal.hillshade(seFacing, 9, 9, 1, 1)(4 * 9 + 4)
    assert(lit > 181 && shaded < 181, s"lit=$lit shaded=$shaded")
  }

  test("roughness, tpi, tri on a checkerboard") {
    val cb = plane(8, 8, (x, y) => if ((x + y) % 2 == 0) 0 else 100)
    assert(Focal.roughness(cb, 8, 8).forall(_ == 100))
    val tri = Focal.tri(cb, 8, 8)
    // interior: 4 orthogonal neighbors differ by 100, 4 diagonal equal
    assert(math.abs(tri(3 * 8 + 3) - 50.0) < 1e-9)
    val tpi = Focal.tpi(cb, 8, 8)
    assert(math.abs(tpi(3 * 8 + 3) - (0 - 50.0)) < 1e-9)
  }

  test("convolve3x3 box blur preserves a constant and averages a spike") {
    val flat = plane(5, 5, (_, _) => 40)
    val k = Array.fill(9)(1.0)
    assert(Focal.convolve3x3(flat, 5, 5, k, normalize = true).forall(_ == 40.0))
    val spike = plane(5, 5, (x, y) => if (x == 2 && y == 2) 90 else 0)
    val out = Focal.convolve3x3(spike, 5, 5, k, normalize = true)
    assert(math.abs(out(2 * 5 + 2) - 10.0) < 1e-9)
    assert(math.abs(out(1 * 5 + 1) - 10.0) < 1e-9)
    assert(out(0) == 0.0)
  }
}
