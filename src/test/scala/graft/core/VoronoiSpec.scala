package graft.core

import org.scalatest.funsuite.AnyFunSuite

class VoronoiSpec extends AnyFunSuite {

  private def ringArea(r: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i + 3 < r.length) {
      s += r(i) * r(i + 3) - r(i + 2) * r(i + 1)
      i += 2
    }
    math.abs(s) / 2.0
  }

  test("2x2 site grid yields the four quadrant cells") {
    val xs = Array(0.0, 2.0, 0.0, 2.0)
    val ys = Array(0.0, 0.0, 2.0, 2.0)
    val rings = Voronoi.cellRings(xs, ys, -1, -1, 3, 3)
    assert(rings.length == 4)
    rings.foreach(r => assert(math.abs(ringArea(r) - 4.0) < 1e-12))
    // site 0's cell is [-1,1]x[-1,1]
    val r0 = rings(0).grouped(2).toArray.dropRight(1)
    assert(r0.forall { case Array(x, y) => x >= -1 - 1e-12 && x <= 1 + 1e-12 &&
      y >= -1 - 1e-12 && y <= 1 + 1e-12 })
  }

  test("cells partition the box: areas sum exactly, sites inside own cell") {
    // hashed pseudo-random distinct sites
    val n = 40
    val xs = Array.tabulate(n)(i => ((i * 9973L) % 1000L) / 10.0)
    val ys = Array.tabulate(n)(i => ((i * 7919L) % 1000L) / 10.0)
    val rings = Voronoi.cellRings(xs, ys, -5, -5, 105, 105)
    val total = rings.map(ringArea).sum
    assert(math.abs(total - 110.0 * 110.0) < 1e-6, s"area sum $total")
    val wkbs = Voronoi.cells(xs, ys, -5, -5, 105, 105)
    (0 until n).foreach { i =>
      assert(Pip.contains(wkbs(i), xs(i), ys(i)), s"site $i not in own cell")
    }
  }

  test("PIP assignment against cells matches brute-force argmin") {
    val n = 25
    val xs = Array.tabulate(n)(i => ((i * 31L) % 97L).toDouble)
    val ys = Array.tabulate(n)(i => ((i * 17L) % 89L).toDouble)
    val wkbs = Voronoi.cells(xs, ys, -10, -10, 110, 110)
    var checked = 0
    for (px <- 0 until 100 by 7; py <- 0 until 100 by 7) {
      val qx = px + 0.31; val qy = py + 0.47
      val d2 = Array.tabulate(n)(i =>
        (qx - xs(i)) * (qx - xs(i)) + (qy - ys(i)) * (qy - ys(i)))
      val best = d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      val strict = d2.sorted.take(2) match { case Array(a, b) => b > a }
      if (strict) {
        val hits = (0 until n).filter(i => Pip.contains(wkbs(i), qx, qy))
        assert(hits.contains(best), s"probe ($qx,$qy): argmin $best, PIP $hits")
        checked += 1
      }
    }
    assert(checked > 150)
  }

  test("collinear sites fall back to slab cells that still partition") {
    val xs = Array(0.0, 1.0, 2.0, 3.0)
    val ys = Array(0.0, 0.0, 0.0, 0.0)
    val rings = Voronoi.cellRings(xs, ys, -1, -1, 4, 1)
    assert(math.abs(rings.map(ringArea).sum - 5.0 * 2.0) < 1e-12)
    // middle cells are width-1 slabs of the box
    assert(math.abs(ringArea(rings(1)) - 2.0) < 1e-12)
    assert(math.abs(ringArea(rings(2)) - 2.0) < 1e-12)
  }
}
