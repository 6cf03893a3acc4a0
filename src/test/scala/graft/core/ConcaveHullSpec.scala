package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ConcaveHullSpec extends AnyFunSuite {

  private def shoelace2(ring: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i + 3 < ring.length) {
      s += ring(i) * ring(i + 3) - ring(i + 2) * ring(i + 1)
      i += 2
    }
    math.abs(s)
  }

  /** Integer lattice points of the q102 cross fixture (arms half-width w,
    * half-length l, centered at origin). */
  private def crossPoints(l: Int, w: Int): (Array[Double], Array[Double]) = {
    val pts = for {
      x <- -l to l; y <- -l to l
      if (math.abs(y) <= w && math.abs(x) <= l) || (math.abs(x) <= w && math.abs(y) <= l)
    } yield (x.toDouble, y.toDouble)
    (pts.map(_._1).toArray, pts.map(_._2).toArray)
  }

  test("ratio=1 reproduces the convex hull (octagon of the cross)") {
    val (xs, ys) = crossPoints(5, 2)
    val ring = ConcaveHull.hullRing(xs, ys, 1.0)
    assert(ring != null)
    // convex hull of the cross: square 2l x 2l minus 4 corner triangles of
    // leg (l - w): 2*area = 2*(4*l*l - 2*(l-w)^2)
    assert(math.round(shoelace2(ring)) == 2 * (4 * 5 * 5 - 2 * 3 * 3))
  }

  test("small ratio recovers the exact cross outline for every q102 key") {
    for (k <- 0 until 25) {
      val l = 4 + k % 3; val w = 1 + k % 2
      val (xs, ys) = crossPoints(l, w)
      val ring = ConcaveHull.hullRing(xs, ys, 0.05)
      assert(ring != null, s"k=$k")
      // exact cross area: 8*l*w - 4*w^2 ; ring vertex count: perimeter 8*l
      assert(math.round(shoelace2(ring)) == 2 * (8 * l * w - 4 * w * w), s"k=$k")
      assert(ring.length / 2 - 1 == 8 * l, s"k=$k")
    }
  }

  test("collinear and tiny inputs fall back gracefully") {
    assert(ConcaveHull.hullRing(Array(0.0, 1.0), Array(0.0, 1.0), 0.5) == null)
    val xs = Array(0.0, 1.0, 2.0, 3.0)
    val ys = Array(0.0, 0.0, 0.0, 0.0)
    // collinear: triangulation yields no real triangle
    assert(ConcaveHull.hullRing(xs, ys, 0.5) == null)
    // kernel falls back to convex hull without throwing
    val mp = Wkb.writeMultiPoint(Array(0.0, 0.0, 1.0, 0.0, 2.0, 0.0))
    val h = GeomOps.concaveHull(mp, 0.5)
    assert(h != null)
  }

  test("hull ring is simple (no repeated interior vertices)") {
    val (xs, ys) = crossPoints(6, 2)
    val ring = ConcaveHull.hullRing(xs, ys, 0.05)
    val verts = ring.grouped(2).toSeq.dropRight(1)
    assert(verts.distinct.size == verts.size)
  }
}
