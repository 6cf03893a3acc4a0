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

  // ---- iso-polygon (band) mode ----

  private def shoelace2(ring: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i + 3 < ring.length) {
      s += ring(i) * ring(i + 3) - ring(i + 2) * ring(i + 1)
      i += 2
    }
    math.abs(s)
  }

  test("band areas partition the cell grid exactly (stripe fixture pattern)") {
    for (key <- Seq(1L, 2L, 5L, 8L); sz <- Seq(16, 20)) {
      val band = Array.tabulate(sz * sz) { i =>
        val x = i % sz; val y = i / sz
        ((x * 7 + y * 13 + key * 31) % 256).toInt
      }
      val bs = Contour.bands(band, sz, sz, idGt, Seq(64.0, 128.0, 192.0), emitWkb = false)
      assert(bs.length == 4)
      assert(bs.map(_.iv) == Seq(0, 1, 2, 3))
      val full = (sz - 1).toLong * (sz - 1) * 4L * Contour.FullTriQ
      assert(bs.map(_.areaQ).sum == full, s"key=$key sz=$sz")
      assert(bs.forall(_.areaQ >= 0))
    }
  }

  test("emitted band polygons have exactly the quantized area (shoelace == area_q)") {
    val sz = 16
    val band = Array.tabulate(sz * sz) { i =>
      val x = i % sz; val y = i / sz
      ((x * 7 + y * 13 + 3 * 31) % 256).toInt
    }
    val bs = Contour.bands(band, sz, sz, idGt, Seq(64.0, 128.0, 192.0), emitWkb = true)
    bs.foreach { b =>
      if (b.areaQ > 0) {
        assert(b.wkb != null)
        val polys = Wkb.read(b.wkb).polygons
        assert(polys.length == b.nPieces, s"iv=${b.iv}")
        // every vertex is on the 1/2048-pixel lattice -> shoelace is exact
        val sum2 = polys.map(p => shoelace2(p.rings(0))).sum
        assert(math.round(sum2 * (1L << 22)).toDouble == b.areaQ.toDouble * 1.0, s"iv=${b.iv}")
      } else assert(b.wkb == null && b.nPieces == 0)
    }
  }

  test("uniform raster puts the whole area in one interval") {
    val band = Array.fill(25)(100)
    val bs = Contour.bands(band, 5, 5, idGt, Seq(64.0, 128.0), emitWkb = true)
    assert(bs.map(_.areaQ) == Seq(0L, 16L * 4 * Contour.FullTriQ, 0L))
    assert(bs(1).nPieces == 16 * 4)
    // interval bounds are carried on the struct
    assert(bs(0).lvlLo.isNegInfinity && bs(2).lvlHi.isPosInfinity)
    assert(bs(1).lvlLo == 64.0 && bs(1).lvlHi == 128.0)
  }

  test("linear ramp splits a single cell at the interpolated chord (exact fractions)") {
    // one cell: tl=0 tr=0 / bl=100 br=100, level 50: band [50,inf) is the
    // lower half of the cell; center = 50 sits exactly on the level
    val band = Array(0, 0, 100, 100)
    val bs = Contour.bands(band, 2, 2, idGt, Seq(50.0), emitWkb = true)
    assert(bs.map(_.iv) == Seq(0, 1))
    // halves: each 2 of the 4 triangles' worth of area
    assert(bs(0).areaQ == 2L * Contour.FullTriQ)
    assert(bs(1).areaQ == 2L * Contour.FullTriQ)
  }

  // ---- merged ring output (polygon_ring_appender semantics) ----

  test("flat image merges to ONE shell covering the raster, no holes") {
    val band = Array.fill(36)(100)
    val rb = Contour.ringBands(band, 6, 6, idGt, Seq(64.0, 128.0), emitWkb = true)
    assert(rb.map(r => (r.nShells, r.nHoles)) == Seq((0, 0), (1, 0), (0, 0)))
    // 5x5 cells, 4 triangles each, fully in band
    assert(rb(1).ringAreaQ == 25L * 4 * Contour.FullTriQ)
    assert(rb(0).wkb == null && rb(2).wkb == null)
    // shell area via the WKB measure (identity gt → cell units)
    assert(math.abs(GeomOps.area(rb(1).wkb) - 25.0) < 1e-9)
  }

  test("cone: the below-level interval is an annulus (1 shell + 1 hole)") {
    val w = 11; val h = 11
    val band = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.max(0, 80 - 10 * math.max(math.abs(x - 5), math.abs(y - 5)))
    }
    val rb = Contour.ringBands(band, w, h, idGt, Seq(45.0), emitWkb = true)
    val Seq(below, above) = rb
    assert(above.nShells == 1 && above.nHoles == 0)
    assert(below.nShells == 1 && below.nHoles == 1)
    // areas complement exactly to the full raster
    assert(below.ringAreaQ + above.ringAreaQ == 100L * 4 * Contour.FullTriQ)
    // hole is nested in the WKB: measured area = shell − hole = signed sum
    assert(math.abs(GeomOps.area(below.wkb) - below.ringAreaQ.toDouble / (1L << 23)) < 1e-9)
    assert(math.abs(GeomOps.area(above.wkb) - above.ringAreaQ.toDouble / (1L << 23)) < 1e-9)
  }

  test("checkerboard (every cell a saddle pinch) traces without inconsistency") {
    val w = 9; val h = 9
    val band = Array.tabulate(w * h)(i => if ((i % w + i / w) % 2 == 0) 200 else 20)
    val rb = Contour.ringBands(band, w, h, idGt, Seq(110.0), emitWkb = true)
    val ref = Contour.bands(band, w, h, idGt, Seq(110.0), emitWkb = false)
    assert(rb.map(_.ringAreaQ) == ref.map(_.areaQ))
    assert(rb.forall(r => r.nShells > 0))
  }

  test("ring signed-area sums equal the triangle-sum interval areas on random rasters") {
    val rnd = new scala.util.Random(42)
    val levels = Seq(64.0, 128.0, 192.0)
    (0 until 20).foreach { _ =>
      val w = 4 + rnd.nextInt(13); val h = 4 + rnd.nextInt(13)
      val band = Array.fill(w * h)(rnd.nextInt(256))
      val rb = Contour.ringBands(band, w, h, idGt, levels, emitWkb = false)
      val ref = Contour.bands(band, w, h, idGt, levels, emitWkb = false)
      assert(rb.map(_.ringAreaQ) == ref.map(_.areaQ), s"w=$w h=$h")
      // Euler sanity: a region with any area has at least one shell
      rb.foreach(r => assert((r.ringAreaQ > 0) == (r.nShells > 0)))
    }
  }

  test("tie-prone non-integer levels still cancel exactly (value-canonical crossings)") {
    // L = 100 + 1/2048: 1024*(L-100)/(101-100) = 0.5 — an exact rounding
    // tie on every 100↔101 edge; direction-computed crossings would land
    // one lattice unit apart on the two sides and never cancel
    val tieLevel = 100.0 + 1.0 / 2048.0
    val rnd = new scala.util.Random(11)
    (0 until 10).foreach { _ =>
      val w = 5 + rnd.nextInt(8); val h = 5 + rnd.nextInt(8)
      val band = Array.fill(w * h)(100 + rnd.nextInt(2)) // values ∈ {100, 101}
      val rb = Contour.ringBands(band, w, h, idGt, Seq(tieLevel), emitWkb = true)
      // traces without dangling-edge/revisit failures and rings close:
      // WKB area == signed shoelace sum per interval
      rb.foreach { r =>
        if (r.wkb != null)
          assert(math.abs(GeomOps.area(r.wkb) - r.ringAreaQ.toDouble / (1L << 23)) < 1e-9)
        assert((r.ringAreaQ > 0) == (r.nShells > 0))
      }
      // both intervals partition the raster area exactly
      assert(rb.map(_.ringAreaQ).sum == (w - 1).toLong * (h - 1) * 4 * Contour.FullTriQ)
    }
  }

  test("ringFeatures: one feature per shell, hole partition + area sums match ringBands") {
    val rnd = new scala.util.Random(23)
    (0 until 10).foreach { _ =>
      val w = 5 + rnd.nextInt(8); val h = 5 + rnd.nextInt(8)
      val band = Array.fill(w * h)(rnd.nextInt(256))
      val levels = Seq(96.0, 160.0)
      val rb = Contour.ringBands(band, w, h, idGt, levels, emitWkb = true)
      val rf = Contour.ringFeatures(band, w, h, idGt, levels, emitWkb = true)
      rb.foreach { b =>
        val feats = rf.filter(_.iv == b.iv)
        assert(feats.length == b.nShells)
        assert(feats.map(_.nHoles).sum == b.nHoles)
        assert(feats.map(_.featAreaQ).sum == b.ringAreaQ)
        // each feature's WKB measures its own signed area exactly
        feats.foreach { f =>
          assert(math.abs(GeomOps.area(f.wkb) - f.featAreaQ.toDouble / (1L << 23)) < 1e-9)
        }
      }
    }
    // cone: below-interval feature = annulus (1 shell, 1 hole)
    val w = 11
    val band = Array.tabulate(w * w) { i =>
      val x = i % w; val y = i / w
      math.max(0, 80 - 10 * math.max(math.abs(x - 5), math.abs(y - 5)))
    }
    val fs = Contour.ringFeatures(band, w, w, idGt, Seq(45.0), emitWkb = true)
    assert(fs.map(f => (f.iv, f.nHoles)).sortBy(_._1) == Seq((0, 1), (1, 0)))
  }

  test("ring WKB areas match the signed sums on random rasters (nesting exact)") {
    val rnd = new scala.util.Random(7)
    (0 until 8).foreach { _ =>
      val w = 5 + rnd.nextInt(8); val h = 5 + rnd.nextInt(8)
      val band = Array.fill(w * h)(rnd.nextInt(256))
      Contour.ringBands(band, w, h, idGt, Seq(96.0, 160.0), emitWkb = true).foreach { r =>
        if (r.wkb != null)
          assert(math.abs(GeomOps.area(r.wkb) - r.ringAreaQ.toDouble / (1L << 23)) < 1e-9)
      }
    }
  }
}
