package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Geometry measures + overlay kernel (GeomOps / Clip). Reference
  * semantics: ogr/ogrgeometry.cpp get_Area / Centroid / Distance /
  * ConvexHull; ogrlayer.cpp layer-algebra overlays (GEOS-backed there). */
class GeomOpsSpec extends AnyFunSuite {
  private val Eps = 1e-9

  /** Deterministic random convex polygon around (cx, cy). */
  private def randomConvex(rnd: scala.util.Random, cx: Double, cy: Double, rMax: Double): Array[Byte] = {
    val n = 3 + rnd.nextInt(6)
    val angles = Array.fill(n)(rnd.nextDouble() * 2 * math.Pi).sorted
    val r = rMax * (0.4 + 0.6 * rnd.nextDouble())
    val pts = angles.map(a => (cx + r * math.cos(a), cy + r * math.sin(a)))
    val ring = (pts :+ pts.head).flatMap(p => Array(p._1, p._2))
    Wkb.writePolygon(Array(ring))
  }

  test("area: box, box-with-hole, multipolygon") {
    assert(math.abs(GeomOps.area(Wkb.writeBox(0, 0, 4, 3)) - 12.0) < Eps)
    val outer = Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0)
    val hole = Array(2.0, 2, 6, 2, 6, 6, 2, 6, 2, 2)
    assert(math.abs(GeomOps.area(Wkb.writePolygon(Array(outer, hole))) - (100.0 - 16.0)) < Eps)
    val mp = Wkb.writeMultiPolygon(Array(
      Array(Array(0.0, 0, 1, 0, 1, 1, 0, 1, 0, 0)),
      Array(Array(5.0, 5, 7, 5, 7, 8, 5, 8, 5, 5))))
    assert(math.abs(GeomOps.area(mp) - (1.0 + 6.0)) < Eps)
  }

  test("length/perimeter and centroid") {
    assert(math.abs(GeomOps.length(Wkb.writeBox(0, 0, 4, 3)) - 14.0) < Eps)
    val (cx, cy) = GeomOps.centroid(Wkb.writeBox(2, 4, 6, 10))
    assert(math.abs(cx - 4.0) < Eps && math.abs(cy - 7.0) < Eps)
    // hole pulls the centroid away: box [0,10]² with hole [6,10]×[6,10]
    val g = Wkb.writePolygon(Array(
      Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(6.0, 6, 10, 6, 10, 10, 6, 10, 6, 6)))
    val (hx, hy) = GeomOps.centroid(g)
    // exact: (100*5 − 16*8) / 84
    assert(math.abs(hx - (500.0 - 128.0) / 84.0) < Eps)
    assert(math.abs(hy - (500.0 - 128.0) / 84.0) < Eps)
    // centroid of a point / of a linestring
    assert(GeomOps.centroid(Wkb.writePoint(3, -2)) == ((3.0, -2.0)))
  }

  test("distance: points, point-in-polygon, disjoint boxes, touching") {
    assert(math.abs(GeomOps.distance(Wkb.writePoint(0, 0), Wkb.writePoint(3, 4)) - 5.0) < Eps)
    val box = Wkb.writeBox(0, 0, 10, 10)
    assert(GeomOps.distance(Wkb.writePoint(5, 5), box) == 0.0)
    assert(math.abs(GeomOps.distance(Wkb.writePoint(13, 14), box) - 5.0) < Eps)
    val boxB = Wkb.writeBox(13, 0, 20, 10)
    assert(math.abs(GeomOps.distance(box, boxB) - 3.0) < Eps)
    val boxC = Wkb.writeBox(10, 0, 20, 10) // shares an edge
    assert(GeomOps.distance(box, boxC) == 0.0)
    val boxD = Wkb.writeBox(4, 4, 6, 6) // contained
    assert(GeomOps.distance(box, boxD) == 0.0)
  }

  test("convex hull: concave subject, hull is convex and covers vertices") {
    // C-shape
    val c = Wkb.writePolygon(Array(Array(
      0.0, 0, 10, 0, 10, 2, 2, 2, 2, 8, 10, 8, 10, 10, 0, 10, 0, 0)))
    val hull = GeomOps.convexHull(c)
    val hg = Wkb.read(hull)
    assert(Clip.isConvexRing(hg.polygons(0).rings(0)))
    assert(math.abs(GeomOps.area(hull) - 100.0) < Eps) // hull of C-shape = full square
    // random point clouds: every vertex inside-or-on hull
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val pts = Array.fill(20)((rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      val ring = (pts :+ pts.head).flatMap(p => Array(p._1, p._2))
      val ls = {
        val bb = java.nio.ByteBuffer.allocate(9 + 8 * ring.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1: Byte).putInt(Wkb.LineStringType).putInt(ring.length / 2)
        ring.foreach(bb.putDouble)
        bb.array()
      }
      val h = GeomOps.convexHull(ls)
      val hr = Wkb.read(h).polygons(0).rings(0)
      assert(Clip.isConvexRing(hr))
      pts.foreach { case (x, y) =>
        // inside, or on boundary within epsilon (shrink toward hull centroid)
        val (gx, gy) = GeomOps.centroid(h)
        val sx = x + (gx - x) * 1e-9
        val sy = y + (gy - y) * 1e-9
        assert(Pip.contains(h, sx, sy), s"($x,$y) outside hull")
      }
    }
  }

  test("clip intersection: box×box exact coordinates and area") {
    val inter = Clip.intersection(Wkb.writeBox(0, 0, 10, 10), Wkb.writeBox(4, 6, 20, 20)).get
    assert(math.abs(GeomOps.area(inter) - 6.0 * 4.0) < Eps)
    assert(Wkb.envelope(inter) == ((4.0, 6.0, 10.0, 10.0)))
    // axis-aligned clip ⇒ coordinates copied exactly, not interpolated
    val ring = Wkb.read(inter).polygons(0).rings(0)
    ring.grouped(2).foreach { p =>
      assert(Set(4.0, 10.0).contains(p(0)) && Set(6.0, 10.0).contains(p(1)))
    }
    assert(Clip.intersection(Wkb.writeBox(0, 0, 1, 1), Wkb.writeBox(5, 5, 6, 6)).isEmpty)
  }

  test("clip difference: box minus box pieces partition the remainder") {
    val diff = Clip.difference(Wkb.writeBox(0, 0, 10, 10), Wkb.writeBox(4, 4, 6, 6)).get
    assert(math.abs(GeomOps.area(diff) - (100.0 - 4.0)) < Eps)
    // fully-covered subject erases to None
    assert(Clip.difference(Wkb.writeBox(2, 2, 3, 3), Wkb.writeBox(0, 0, 10, 10)).isEmpty)
    // pieces are disjoint: no grid sample point covered twice
    val g = Wkb.read(diff)
    var samples = 0
    for (xi <- 0 until 20; yi <- 0 until 20) {
      val x = 0.25 + xi * 0.5
      val y = 0.25 + yi * 0.5
      val hits = g.polygons.count(p => Pip.inPolygon(p, x, y))
      assert(hits <= 1, s"point ($x,$y) covered by $hits pieces")
      samples += hits
    }
    assert(samples > 0)
  }

  test("overlay identity: area(A∩C) + area(A−C) == area(A) on random convex pairs") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { i =>
      val a = randomConvex(rnd, 0, 0, 10)
      val c = randomConvex(rnd, rnd.nextDouble() * 8 - 4, rnd.nextDouble() * 8 - 4, 8)
      val aArea = GeomOps.area(a)
      val iArea = Clip.intersection(a, c).map(GeomOps.area).getOrElse(0.0)
      val dArea = Clip.difference(a, c).map(GeomOps.area).getOrElse(0.0)
      assert(math.abs(iArea + dArea - aArea) < 1e-6, s"iter $i: $iArea + $dArea != $aArea")
    }
  }

  test("overlay with holes: clipping a donut keeps the hole out of the area") {
    val donut = Wkb.writePolygon(Array(
      Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(3.0, 3, 7, 3, 7, 7, 3, 7, 3, 3)))
    // clip to left half [0,5]: outer 50, hole part 2×4=8 → 42
    val left = Clip.intersection(donut, Wkb.writeBox(0, -1, 5, 11)).get
    assert(math.abs(GeomOps.area(left) - 42.0) < Eps)
    // difference of donut minus right half = same left piece
    val viaDiff = Clip.difference(donut, Wkb.writeBox(5, -1, 15, 11)).get
    assert(math.abs(GeomOps.area(viaDiff) - 42.0) < Eps)
  }

  test("unionAll: overlapping boxes have inclusion-exclusion area; disjoint add") {
    val u = Clip.unionArea(Seq(Wkb.writeBox(0, 0, 10, 10), Wkb.writeBox(5, 5, 15, 15)))
    assert(math.abs(u - (100 + 100 - 25)) < Eps)
    val v = Clip.unionArea(Seq(Wkb.writeBox(0, 0, 1, 1), Wkb.writeBox(5, 5, 6, 6), Wkb.writeBox(0.5, 0.5, 0.6, 0.6)))
    assert(math.abs(v - (1.0 + 1.0)) < Eps)
    // random convex union matches montecarlo-free pairwise check:
    // area(union) == a + b − inter for two polygons
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val a = randomConvex(rnd, 0, 0, 10)
      val b = randomConvex(rnd, rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 10 - 5, 8)
      val expect = GeomOps.area(a) + GeomOps.area(b) -
        Clip.intersection(a, b).map(GeomOps.area).getOrElse(0.0)
      assert(math.abs(Clip.unionArea(Seq(a, b)) - expect) < 1e-6)
    }
  }

  test("line×polygon clip: closed form, partition identity, concave clip") {
    // horizontal segment through a box: clipped length = x-overlap
    val seg = Wkb.writeLineString(Array(-5.0, 2.0, 20.0, 2.0))
    val box = Wkb.writeBox(0, 0, 10, 10)
    val in = Clip.intersection(seg, box).get
    assert(math.abs(GeomOps.length(in) - 10.0) < Eps)
    val outp = Clip.difference(seg, box).get
    assert(math.abs(GeomOps.length(outp) - 15.0) < Eps)
    // diagonal through a box corner region
    val diag = Wkb.writeLineString(Array(-2.0, -2.0, 12.0, 12.0))
    val din = Clip.intersection(diag, box).get
    assert(math.abs(GeomOps.length(din) - 10.0 * math.sqrt(2)) < 1e-9)
    // concave (C-shaped) clip: intersection + difference partition length
    val cShape = Wkb.writePolygon(Array(
      Array(0.0, 0, 10, 0, 10, 2, 3, 2, 3, 8, 10, 8, 10, 10, 0, 10, 0, 0)))
    val probe = Wkb.writeLineString(Array(-3.0, 5.0, 15.0, 5.0, 15.0, 1.0, -3.0, 1.0))
    val lin = Clip.intersection(probe, cShape).map(GeomOps.length).getOrElse(0.0)
    val lout = Clip.difference(probe, cShape).map(GeomOps.length).getOrElse(0.0)
    assert(math.abs(lin + lout - GeomOps.length(probe)) < 1e-9,
      s"partition identity: $lin + $lout != ${GeomOps.length(probe)}")
    assert(lin > 0 && lout > 0)
    // y=5 row crosses only the left bar [0,3]; y=1 row crosses the full [0,10]
    assert(math.abs(lin - (3.0 + 10.0)) < 1e-9)
    // multilinestring roundtrip
    val mls = Wkb.writeMultiLineString(Array(Array(0.0, 0, 1, 1), Array(2.0, 2, 3, 3, 4, 2)))
    val g = Wkb.read(mls)
    assert(g.geomType == Wkb.MultiLineStringType && g.lines.length == 2)
    assert(Wkb.toWkt(mls).startsWith("MULTILINESTRING"))
    assert(Wkb.envelope(mls) == ((0.0, 0.0, 4.0, 3.0)))
  }

  test("st_transform reprojects every vertex and roundtrips") {
    val box = Wkb.writeBox(-10, -20, 30, 40)
    val m = GeomOps.transform(box, 4326, 3857)
    val (minx, miny, maxx, maxy) = Wkb.envelope(m)
    assert(math.abs(minx - Mercator.x(-10)) < Eps)
    assert(math.abs(maxx - Mercator.x(30)) < Eps)
    assert(math.abs(miny - Mercator.y(-20)) < Eps)
    assert(math.abs(maxy - Mercator.y(40)) < Eps)
    val back = GeomOps.transform(m, 3857, 4326)
    val (bx0, by0, bx1, by1) = Wkb.envelope(back)
    assert(math.abs(bx0 - -10) < 1e-9 && math.abs(by1 - 40) < 1e-9)
    assert(math.abs(bx1 - 30) < 1e-9 && math.abs(by0 - -20) < 1e-9)
    // UTM roundtrip on a point
    val p = Wkb.writePoint(-117.25, 33.75)
    val utm = GeomOps.transform(p, 4326, 32611)
    val rt = Wkb.readPoint(GeomOps.transform(utm, 32611, 4326))
    assert(math.abs(rt._1 - -117.25) < 1e-8 && math.abs(rt._2 - 33.75) < 1e-8)
  }

  test("st_intersects covers crossing, touching, containment, holes") {
    import graft.expr.GeomKernels.intersects
    val big = Wkb.writeBox(0, 0, 10, 10)
    assert(intersects(big, Wkb.writeBox(5, 5, 15, 15))) // overlap
    assert(intersects(big, Wkb.writeBox(10, 0, 20, 10))) // shared edge
    assert(intersects(big, Wkb.writeBox(3, 3, 4, 4))) // contained
    assert(intersects(Wkb.writeBox(3, 3, 4, 4), big)) // container (swapped)
    assert(!intersects(big, Wkb.writeBox(20, 20, 30, 30))) // disjoint
    assert(intersects(big, Wkb.writePoint(5, 5)) && !intersects(big, Wkb.writePoint(50, 5)))
    // a box inside a donut's hole does NOT intersect
    val donut = Wkb.writePolygon(Array(
      Array(0.0, 0, 20, 0, 20, 20, 0, 20, 0, 0),
      Array(5.0, 5, 15, 5, 15, 15, 5, 15, 5, 5)))
    assert(!intersects(donut, Wkb.writeBox(8, 8, 12, 12)))
    assert(intersects(donut, Wkb.writeBox(1, 1, 3, 3)))
    assert(intersects(donut, Wkb.writeBox(8, 8, 30, 12))) // spans hole + ring
  }

  test("simplifyTopo: never collapses rings, never lets rings cross") {
    // sliver box (h = 0.25 << tol 1): plain DP drops both mid corners →
    // zero-area chord; topo restores one → a valid w·h/2 triangle
    val sliver = Wkb.writeBox(3, 7, 11, 7.25)
    val plain = GeomOps.simplify(sliver, 1.0)
    assert(GeomOps.numPoints(plain) == 3 && GeomOps.area(plain) == 0.0)
    val topo = GeomOps.simplifyTopo(sliver, 1.0)
    assert(GeomOps.numPoints(topo) == 4)
    assert(math.abs(GeomOps.area(topo) - 8 * 0.25 / 2) < Eps)
    assert(MakeValid.isValidPolygonal(Wkb.read(topo)))
    // tall box: both paths pass it through unchanged
    val tall = Wkb.writeBox(0, 0, 8, 3)
    assert(GeomOps.simplifyTopo(tall, 1.0).sameElements(GeomOps.simplify(tall, 1.0)))
    // cross-ring guard: dropping the shell's tent vertex (dev 0.4 < tol
    // 0.5) would sink the shell top (y=8.4) below the hole top (y=8.45)
    // — a proper ring crossing. Plain does it; topo must restore.
    val tent = Wkb.writePolygon(Array(
      Array(0.0, 0, 10, 0, 10, 8.4, 5, 8.8, 0, 8.4, 0, 0),
      Array(2.0, 2, 8, 2, 8, 8.45, 2, 8.45, 2, 2)))
    val pl2 = GeomOps.simplify(tent, 0.5)
    assert(!MakeValid.isValidPolygonal(Wkb.read(pl2))) // plain DP breaks it
    val tp2 = GeomOps.simplifyTopo(tent, 0.5)
    assert(MakeValid.isValidPolygonal(Wkb.read(tp2)))
    assert(GeomOps.numPoints(tp2) == GeomOps.numPoints(tent)) // tent restored
    assert(math.abs(GeomOps.area(tp2) - GeomOps.area(tent)) < Eps)
  }

  test("geometry ETL: swap_xy, segmentize, simplify, dump") {
    val box = Wkb.writeBox(1, 2, 11, 6)
    assert(Wkb.envelope(GeomOps.swapXY(box)) == ((2.0, 1.0, 6.0, 11.0)))
    // segmentize: edges 10 and 4 at maxLen 3 → 4 + 2 parts per edge
    val seg = GeomOps.segmentize(box, 3.0)
    assert(GeomOps.numPoints(seg) == 2 * 4 + 2 * 2 + 1)
    assert(math.abs(GeomOps.area(seg) - 40.0) < Eps)
    // simplify drops the collinear inserted points again
    val simp = GeomOps.simplify(seg, 1e-9)
    assert(GeomOps.numPoints(simp) == 5)
    assert(math.abs(GeomOps.area(simp) - 40.0) < Eps)
    // simplify keeps genuinely bent shapes within tolerance
    val zig = Wkb.writePolygon(Array(Array(
      0.0, 0, 5, 0.05, 10, 0, 10, 10, 0, 10, 0, 0)))
    assert(GeomOps.numPoints(GeomOps.simplify(zig, 0.1)) == 5) // bump flattened
    assert(GeomOps.numPoints(GeomOps.simplify(zig, 0.01)) == 6) // bump kept
    // dump explodes multipolygons
    val mp = Wkb.writeMultiPolygon(Array(
      Array(Array(0.0, 0, 1, 0, 1, 1, 0, 1, 0, 0)),
      Array(Array(5.0, 5, 6, 5, 6, 6, 5, 6, 5, 5))))
    val parts = GeomOps.dump(mp)
    assert(parts.length == 2)
    assert(parts.map(GeomOps.area).sum == 2.0)
    assert(GeomOps.dump(box).length == 1)
  }

  test("full OGR predicate set: within/contains/overlaps/touches/crosses/equals") {
    import graft.expr.GeomKernels.predicate
    val big = Wkb.writeBox(0, 0, 10, 10)
    val small = Wkb.writeBox(2, 2, 5, 5)
    val half = Wkb.writeBox(5, 0, 15, 10)
    val adjacent = Wkb.writeBox(10, 0, 20, 10)
    val far = Wkb.writeBox(30, 30, 40, 40)
    assert(predicate("within", small, big) && !predicate("within", big, small))
    assert(predicate("contains", big, small) && !predicate("contains", small, big))
    assert(predicate("within", big, big) && predicate("equals", big, big))
    assert(!predicate("equals", big, small))
    assert(predicate("overlaps", big, half) && !predicate("overlaps", big, small))
    assert(!predicate("overlaps", big, adjacent) && !predicate("overlaps", big, far))
    assert(predicate("touches", big, adjacent) && !predicate("touches", big, half))
    assert(!predicate("touches", big, far))
    // point on boundary touches; interior point does not
    assert(predicate("touches", Wkb.writePoint(10, 5), big))
    assert(!predicate("touches", Wkb.writePoint(5, 5), big))
    // line crossing the box vs line inside vs line outside
    def line(pts: (Double, Double)*): Array[Byte] = {
      val c = pts.flatMap(p => Seq(p._1, p._2)).toArray
      val bb = java.nio.ByteBuffer.allocate(9 + 8 * c.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(1: Byte).putInt(Wkb.LineStringType).putInt(c.length / 2)
      c.foreach(bb.putDouble)
      bb.array()
    }
    assert(predicate("crosses", line((-5.0, 5.0), (5.0, 5.0)), big))
    assert(!predicate("crosses", line((1.0, 1.0), (9.0, 9.0)), big))
    assert(!predicate("crosses", line((-5.0, -5.0), (-1.0, -1.0)), big))
    assert(!predicate("crosses", big, small)) // areal×areal never crosses
    // within honors holes: a box inside the donut's hole is NOT within
    val donut = Wkb.writePolygon(Array(
      Array(0.0, 0, 20, 0, 20, 20, 0, 20, 0, 0),
      Array(8.0, 8, 12, 8, 12, 12, 8, 12, 8, 8)))
    assert(!predicate("within", Wkb.writeBox(9, 9, 11, 11), donut))
    assert(predicate("within", Wkb.writeBox(1, 1, 5, 5), donut))
  }

  test("numPoints counts all vertices incl. closing") {
    assert(GeomOps.numPoints(Wkb.writeBox(0, 0, 1, 1)) == 5)
    assert(GeomOps.numPoints(Wkb.writePoint(1, 2)) == 1)
  }
}
