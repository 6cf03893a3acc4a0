package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BufferSpec extends AnyFunSuite {
  private val Q = 8
  private def ngonDisc(r: Double, quadsegs: Int = Q): Double = {
    val n = 4 * quadsegs
    n / 2.0 * r * r * math.sin(2 * math.Pi / n)
  }

  test("point buffers to the regular 4q-gon disc") {
    val d = Buffer.buffer(Wkb.writePoint(3, 4), 2.0, Q).get
    assert(math.abs(GeomOps.area(d) - ngonDisc(2.0)) < 1e-9)
    val (minx, miny, maxx, maxy) = Wkb.envelope(d)
    assert(math.abs(minx - 1.0) < 1e-12 && math.abs(maxx - 5.0) < 1e-12)
    assert(math.abs(miny - 2.0) < 1e-12 && math.abs(maxy - 6.0) < 1e-12)
  }

  test("segment buffers to a capsule: 2·r·len + disc") {
    val cap = Buffer.buffer(Wkb.writeLineString(Array(0.0, 0.0, 10.0, 0.0)), 1.5, Q).get
    assert(math.abs(GeomOps.area(cap) - (2 * 1.5 * 10.0 + ngonDisc(1.5))) < 1e-9)
    // multi-segment polyline: capsules overlap at the joint; union area
    // must stay below the sum and above the straight-line equivalent parts
    val l = Buffer.buffer(Wkb.writeLineString(Array(0.0, 0, 10, 0, 10, 10)), 1.0, Q).get
    val a = GeomOps.area(l)
    assert(a < 2 * (2 * 10.0 + ngonDisc(1.0)))
    assert(a > 2 * 2 * 10.0)
  }

  test("box grows by A + P·r + ngon and erodes to the exact inset rectangle") {
    val box = Wkb.writeBox(0, 0, 20, 10)
    val r = 1.25
    val grown = Buffer.buffer(box, r, Q).get
    assert(math.abs(GeomOps.area(grown) - (200.0 + 60.0 * r + ngonDisc(r))) < 1e-8)
    val shrunk = Buffer.buffer(box, -r, Q).get
    assert(math.abs(GeomOps.area(shrunk) - (20 - 2 * r) * (10 - 2 * r)) < 1e-8)
    // full erosion → empty
    assert(Buffer.buffer(box, -5.0, Q).isEmpty)
  }

  test("concave polygon buffer: containment + monotone area + erosion sanity") {
    val L = Wkb.writePolygon(Array(Array(0.0, 0, 10, 0, 10, 3, 3, 3, 3, 10, 0, 10, 0, 0)))
    val a0 = GeomOps.area(L)
    val g1 = Buffer.buffer(L, 0.5, Q).get
    val g2 = Buffer.buffer(L, 1.0, Q).get
    assert(GeomOps.area(g1) > a0 && GeomOps.area(g2) > GeomOps.area(g1))
    // every original vertex strictly inside the grown polygon
    val ring = Wkb.read(L).polygons(0).rings(0)
    var i = 0
    while (i < ring.length - 2) {
      assert(Pip.contains(g1, ring(i), ring(i + 1)), s"vertex ${ring(i)},${ring(i + 1)} outside")
      i += 2
    }
    // erosion shrinks and stays inside the original
    val e = Buffer.buffer(L, -0.5, Q).get
    assert(GeomOps.area(e) < a0)
    assert(Clip.difference(e, L).isEmpty, "eroded polygon must lie inside the original")
  }

  test("polygon with a hole: positive buffer shrinks the hole") {
    val donut = Wkb.writePolygon(Array(
      Array(0.0, 0, 12, 0, 12, 12, 0, 12, 0, 0),
      Array(4.0, 4, 8, 4, 8, 8, 4, 4 + 4, 4, 4))) // hole 4..8
    val r = 1.0
    val grown = Buffer.buffer(donut, r, Q).get
    // hole center must stay a hole; points within r of the old hole edge are covered
    assert(!Pip.contains(grown, 6.0, 6.0))
    assert(Pip.contains(grown, 4.5, 6.0))
    // exact: outer grows A+P·r+ngon; hole insets to (4-2r)²
    val expect = (144.0 - 16.0) + 48.0 * r + ngonDisc(r) + (16.0 - (4 - 2 * r) * (4 - 2 * r))
    assert(math.abs(GeomOps.area(grown) - expect) < 1e-8)
  }
}
