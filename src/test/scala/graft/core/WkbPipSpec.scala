package graft.core

import org.scalatest.funsuite.AnyFunSuite

class WkbPipSpec extends AnyFunSuite {

  test("wkb point/polygon roundtrip and envelope-without-parse") {
    val p = Wkb.writePoint(-117.5, 33.25)
    assert(Wkb.readPoint(p) == ((-117.5, 33.25)))
    assert(Wkb.geomType(p) == Wkb.PointType)
    val box = Wkb.writeBox(-10, -5, 20, 15)
    assert(Wkb.geomType(box) == Wkb.PolygonType)
    assert(Wkb.envelope(box) == ((-10.0, -5.0, 20.0, 15.0)))
    val poly = Wkb.readPolygon(box)
    assert(poly.rings.length == 1 && poly.rings(0).length == 10)
    val mp = Wkb.writeMultiPolygon(Array(
      Array(Array(0.0, 0, 1, 0, 1, 1, 0, 1, 0, 0)),
      Array(Array(5.0, 5, 6, 5, 6, 7, 5, 7, 5, 5))))
    assert(Wkb.envelope(mp) == ((0.0, 0.0, 6.0, 7.0)))
    assert(Wkb.read(mp).polygons.length == 2)
  }

  test("wkt rendering") {
    val box = Wkb.writeBox(0, 0, 2, 1)
    assert(Wkb.toWkt(box) == "POLYGON ((0 0,2 0,2 1,0 1,0 0))")
  }

  test("pip box semantics") {
    val box = Wkb.writeBox(0, 0, 10, 10)
    assert(Pip.contains(box, 5, 5))
    assert(!Pip.contains(box, 15, 5))
    assert(!Pip.contains(box, -0.001, 5))
    assert(Pip.contains(box, 0.001, 9.999))
  }

  test("pip respects holes via even-odd parity") {
    val outer = Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0)
    val hole = Array(3.0, 3, 7, 3, 7, 7, 3, 7, 3, 3)
    val withHole = Wkb.writePolygon(Array(outer, hole))
    assert(Pip.contains(withHole, 1, 1))
    assert(!Pip.contains(withHole, 5, 5)) // inside the hole
    assert(Pip.contains(withHole, 8.5, 5))
  }

  test("pip concave C-shape") {
    // C open to the right: outer box minus a right-side notch
    val c = Wkb.writePolygon(Array(Array(
      0.0, 0, 10, 0, 10, 2, 3, 2, 3, 8, 10, 8, 10, 10, 0, 10, 0, 0)))
    assert(Pip.contains(c, 1.5, 5))   // spine
    assert(!Pip.contains(c, 6, 5))    // notch interior
    assert(Pip.contains(c, 6, 1))     // bottom arm
    assert(Pip.contains(c, 6, 9))     // top arm
  }

  test("pip agrees with half-plane oracle on 500 random convex polygons") {
    val rnd = new java.util.Random(42)
    var checked = 0
    while (checked < 500) {
      val cx = rnd.nextDouble() * 340 - 170
      val cy = rnd.nextDouble() * 160 - 80
      val r = 0.5 + rnd.nextDouble() * 4.5
      val k = 3 + rnd.nextInt(10)
      val ring = new Array[Double](2 * (k + 1))
      for (i <- 0 until k) {
        ring(2 * i) = cx + r * math.cos(2 * math.Pi * i / k)
        ring(2 * i + 1) = cy + r * math.sin(2 * math.Pi * i / k)
      }
      ring(2 * k) = ring(0); ring(2 * k + 1) = ring(1)
      val wkb = Wkb.writePolygon(Array(ring))
      val px = cx + (rnd.nextDouble() * 3 - 1.5) * r
      val py = cy + (rnd.nextDouble() * 3 - 1.5) * r
      // convex oracle: inside iff on the inner (ccw-left) side of every edge
      var inside = true
      var minEdgeDist = Double.MaxValue
      for (i <- 0 until k) {
        val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
        val x2 = ring(2 * i + 2); val y2 = ring(2 * i + 3)
        val cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if (cross < 0) inside = false
        minEdgeDist = math.min(minEdgeDist, math.abs(cross) / math.hypot(x2 - x1, y2 - y1))
      }
      if (minEdgeDist > 1e-6) { // skip boundary-ambiguous samples
        assert(Pip.contains(wkb, px, py) == inside,
          s"cx=$cx cy=$cy r=$r k=$k px=$px py=$py")
        checked += 1
      }
    }
  }

  test("bbox intersects + polygon×box refine") {
    assert(Pip.bboxIntersects(0, 0, 10, 10, 5, 5, 15, 15))
    assert(!Pip.bboxIntersects(0, 0, 10, 10, 11, 0, 12, 10))
    val tri = Wkb.writePolygon(Array(Array(0.0, 0, 10, 0, 0, 10, 0, 0)))
    assert(Pip.polygonIntersectsBox(tri, 1, 1, 2, 2))      // box inside triangle
    assert(Pip.polygonIntersectsBox(tri, -5, -5, 15, 15))  // triangle inside box
    assert(Pip.polygonIntersectsBox(tri, 4, 4, 8, 8))      // edge crosses box
    assert(!Pip.polygonIntersectsBox(tri, 8, 8, 9, 9))     // off the hypotenuse
  }
}
