package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RasterVectorSpec extends AnyFunSuite {
  private val idGt = Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0) // pixel == geo, y down

  test("rasterize axis-aligned box burns exactly the covered centers") {
    val grid = Rasterize.rasterize(8, 8, idGt, Seq((Wkb.writeBox(1, 1, 4, 3), 7)))
    for (y <- 0 until 8; x <- 0 until 8) {
      val expected = if (x >= 1 && x < 4 && y >= 1 && y < 3) 7 else 0
      assert(grid(y * 8 + x) == expected, s"($x,$y)")
    }
  }

  test("rasterize triangle uses even-odd centers rule") {
    val tri = Wkb.writePolygon(Array(Array(0.0, 0, 8, 0, 0, 8, 0, 0)))
    val grid = Rasterize.rasterize(8, 8, idGt, Seq((tri, 1)))
    // pixel center (x+.5, y+.5) inside x+y<8 ⇔ x+y+1<8
    for (y <- 0 until 8; x <- 0 until 8) {
      val expected = if (x + 0.5 + y + 0.5 < 8.0) 1 else 0
      assert(grid(y * 8 + x) == expected, s"($x,$y)")
    }
  }

  test("rasterize Add merge accumulates overlaps") {
    val a = Wkb.writeBox(0, 0, 4, 4)
    val b = Wkb.writeBox(2, 2, 6, 6)
    val grid = Rasterize.rasterize(8, 8, idGt, Seq((a, 1), (b, 1)), merge = Rasterize.Add)
    assert(grid(1 * 8 + 1) == 1)
    assert(grid(3 * 8 + 3) == 2)
    assert(grid(5 * 8 + 5) == 1)
    assert(grid(7 * 8 + 7) == 0)
  }

  test("rasterize polygon with hole leaves the hole unburned") {
    val poly = Wkb.writePolygon(Array(
      Array(0.0, 0, 8, 0, 8, 8, 0, 8, 0, 0),
      Array(2.0, 2, 6, 2, 6, 6, 2, 6, 2, 2)))
    val grid = Rasterize.rasterize(8, 8, idGt, Seq((poly, 9)))
    assert(grid(0) == 9)
    assert(grid(4 * 8 + 4) == 0)
    assert(grid(1 * 8 + 4) == 9)
  }

  test("polygonize a two-region grid (4-connected)") {
    // left half 1, right half 2
    val grid = Array.tabulate(16)(i => if (i % 4 < 2) 1 else 2)
    val regs = Polygonize.polygonize(grid, 4, 4, idGt)
    assert(regs.length == 2)
    val r1 = regs.find(_.value == 1).get
    assert(r1.pixelCount == 8)
    assert(Wkb.toWkt(r1.wkb) == "POLYGON ((0 0,0 4,2 4,2 0,0 0))" ||
      Wkb.envelope(r1.wkb) == ((0.0, 0.0, 2.0, 4.0)))
  }

  test("polygonize emits hole rings for enclosed regions") {
    // 8x8 of 1 with a 2-valued 2x2 island
    val grid = Array.fill(64)(1)
    for (y <- 3 to 4; x <- 3 to 4) grid(y * 8 + x) = 2
    val regs = Polygonize.polygonize(grid, 8, 8, idGt)
    assert(regs.length == 2)
    val outer = regs.find(_.value == 1).get
    val island = regs.find(_.value == 2).get
    assert(island.pixelCount == 4)
    assert(Wkb.read(outer.wkb).polygons(0).rings.length == 2, "outer region must have a hole ring")
    assert(Wkb.envelope(island.wkb) == ((3.0, 3.0, 5.0, 5.0)))
    // PIP consistency: island center is NOT in the outer polygon
    assert(!Pip.contains(outer.wkb, 4.0, 4.0))
    assert(Pip.contains(outer.wkb, 1.0, 1.0))
  }

  test("polygonize 4- vs 8-connected diagonal pixels") {
    // two diagonal pixels of value 5 on 0 background
    val grid = Array.fill(16)(0)
    grid(0) = 5; grid(5) = 5 // (0,0) and (1,1)
    val regs4 = Polygonize.polygonize(grid, 4, 4, idGt)
    assert(regs4.count(_.value == 5) == 2, "4-connected keeps diagonals separate")
    val regs8 = Polygonize.polygonize(grid, 4, 4, idGt, connect8 = true)
    assert(regs8.count(_.value == 5) == 1, "8-connected merges diagonals")
  }

  test("rasterize→polygonize roundtrip recovers the box") {
    val box = Wkb.writeBox(2, 1, 6, 5)
    val grid = Rasterize.rasterize(8, 8, idGt, Seq((box, 3)), init = 0)
    val regs = Polygonize.polygonize(grid, 8, 8, idGt, skipValue = Some(0))
    assert(regs.length == 1)
    assert(regs.head.value == 3)
    assert(Wkb.envelope(regs.head.wkb) == ((2.0, 1.0, 6.0, 5.0)))
  }

  test("warp nearest identity and 2x upscale") {
    val src = Raster(4, 4, Array(Array.tabulate(16)(identity)))
    val gt = Array(0.0, 1.0, 0.0, 4.0, 0.0, -1.0) // y-up geo
    val same = Warp.warp(src, gt, 4326, gt, 4326, 4, 4, Warp.Near)
    assert(same.bands(0).sameElements(src.bands(0)))
    val gt2 = Array(0.0, 0.5, 0.0, 4.0, 0.0, -0.5)
    val up = Warp.warp(src, gt, 4326, gt2, 4326, 8, 8, Warp.Near)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(up.bands(0)(y * 8 + x) == src.bands(0)((y / 2) * 4 + x / 2), s"($x,$y)")
  }

  test("warp across CRS preserves a constant raster") {
    val src = Raster(20, 20, Array(Array.fill(400)(99)))
    val srcGt = RefFixtures.ByteGt // UTM-11 meters
    // dst: the z11 (354,818) tile covering it
    val dstGt = TileMath.tileGeoTransform(11, 354, 818)
    val out = Warp.warp(src, srcGt, 32611, dstGt, 3857, 256, 256, Warp.Bilinear, nodata = -1)
    val vals = out.bands(0).filter(_ != -1)
    assert(vals.nonEmpty && vals.forall(_ == 99), "all valid pixels stay 99")
    // some of the tile is outside the 1.2km raster → nodata present
    assert(out.bands(0).contains(-1))
  }

  test("warp average downsample of a checkerboard averages to mid") {
    val cb = Array.tabulate(64)(i => if ((i % 8 + i / 8) % 2 == 0) 0 else 100)
    val src = Raster(8, 8, Array(cb))
    val gt = Array(0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
    val gtDown = Array(0.0, 2.0, 0.0, 8.0, 0.0, -2.0)
    val down = Warp.warp(src, gt, 4326, gtDown, 4326, 4, 4, Warp.Average)
    assert(down.bands(0).forall(_ == 50))
    val d2 = Warp.downsample2x(src)
    assert(d2.w == 4 && d2.bands(0).forall(_ == 50))
  }

  test("cubic upscale of a linear ramp stays on the ramp") {
    val ramp = Array.tabulate(64)(i => (i % 8) * 10)
    val src = Raster(8, 8, Array(ramp))
    val gt = Array(0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
    val gtUp = Array(0.0, 0.5, 0.0, 8.0, 0.0, -0.5)
    val up = Warp.warp(src, gt, 4326, gtUp, 4326, 16, 16, Warp.Cubic)
    // interior pixels: Catmull-Rom reproduces linear functions exactly
    for (y <- 4 until 12; x <- 4 until 12) {
      val expected = ((x + 0.5) * 0.5 - 0.5) * 10.0
      assert(math.abs(up.bands(0)(y * 16 + x) - expected) <= 1.0, s"($x,$y)")
    }
  }
}
