package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** pixel_calc dialect + reclassify range tables (muParser /
  * vrtreclassifier analogs). */
class PixelCalcSpec extends AnyFunSuite {

  private def r2 = Raster(2, 2, Array(Array(10, 20, 30, 40), Array(1, 2, 3, 4)))

  test("arithmetic, precedence, unary minus, parens") {
    val f = PixelCalc.compile("b0 * 2 + b1")
    assert(f(Array(10.0, 1.0)) == 21.0)
    assert(PixelCalc.compile("b0 + b1 * 2")(Array(10.0, 1.0)) == 12.0)
    assert(PixelCalc.compile("(b0 + b1) * 2")(Array(10.0, 1.0)) == 22.0)
    assert(PixelCalc.compile("-b0 + 5")(Array(3.0)) == 2.0)
    assert(PixelCalc.compile("b0 % 7")(Array(10.0)) == 3.0)
    assert(PixelCalc.compile("1e2 + 0.5")(Array()) == 100.5)
  }

  test("functions: sqrt/abs/log10/exp/pow/min/max/floor/ceil") {
    assert(PixelCalc.compile("sqrt(b0)")(Array(49.0)) == 7.0)
    assert(PixelCalc.compile("abs(b0 - 10)")(Array(3.0)) == 7.0)
    assert(PixelCalc.compile("log10(b0)")(Array(1000.0)) == 3.0)
    assert(PixelCalc.compile("pow(b0, 2)")(Array(9.0)) == 81.0)
    assert(PixelCalc.compile("min(b0, b1) + max(b0, b1)")(Array(2.0, 5.0)) == 7.0)
    assert(PixelCalc.compile("floor(b0 / 2) + ceil(b0 / 2)")(Array(5.0)) == 5.0)
  }

  test("evalRaster applies per pixel over every band") {
    val out = PixelCalc.evalRaster(r2, "(b0 + b1) / 2")
    assert(out.toSeq == Seq(5.5, 11.0, 16.5, 22.0))
  }

  test("bad input rejected") {
    intercept[IllegalArgumentException](PixelCalc.compile("nope(b0)")(Array(1.0)))
    intercept[IllegalArgumentException](PixelCalc.compile("b9")(Array(1.0)))
    intercept[Exception](PixelCalc.compile("b0 +"))
  }

  test("reclassify: first matching closed range wins; default and pass-through") {
    val band = Array(5, 64, 63, 127, 200)
    val lo = Array(0.0, 64.0)
    val hi = Array(63.0, 127.0)
    val vals = Array(10, 20)
    assert(PixelCalc.reclassify(band, lo, hi, vals, 9).toSeq == Seq(10, 20, 10, 20, 9))
    assert(PixelCalc.reclassify(band, lo, hi, vals, Int.MinValue).toSeq == Seq(10, 20, 10, 20, 200))
    // overlapping ranges: FIRST wins
    val over = PixelCalc.reclassify(Array(50), Array(0.0, 40.0), Array(63.0, 60.0), Array(1, 2), 0)
    assert(over.toSeq == Seq(1))
  }

  test("cutline mask zeroes bands and validity outside the polygon") {
    import graft.expr.{PlaneBuf, WarpKernels}
    // full-tile buffer: all valid, band values 200
    val full = new Array[Byte](4 * PlaneBuf.PlanePx)
    java.util.Arrays.fill(full, 0, 3 * PlaneBuf.PlanePx, 200.toByte)
    java.util.Arrays.fill(full, 3 * PlaneBuf.PlanePx, 4 * PlaneBuf.PlanePx, 1.toByte)
    val tile = TileMath.pack(2, 1, 1)
    // cutline = western half of the tile's lon/lat extent
    val gt = TileMath.tileGeoTransform(2, 1, 1)
    val minx3857 = gt(0)
    val maxx3857 = gt(0) + 256 * gt(1)
    val midLon = Mercator.lon((minx3857 + maxx3857) / 2)
    val cut = Wkb.writeBox(Mercator.lon(minx3857) - 1, -85, midLon, 85)
    val out = WarpKernels.applyCutline(full, tile, cut)
    val vOff = 3 * PlaneBuf.PlanePx
    val leftValid = (0 until 256).count(x => out(vOff + 128 * 256 + x) != 0)
    assert(math.abs(leftValid - 128) <= 1, s"half-mask kept $leftValid columns")
    // masked pixels zeroed in every plane
    val maskedIdx = 128 * 256 + 250
    assert(out(maskedIdx) == 0 && out(PlaneBuf.PlanePx + maskedIdx) == 0 && out(vOff + maskedIdx) == 0)
    val keptIdx = 128 * 256 + 5
    assert(out(keptIdx) == 200.toByte && out(vOff + keptIdx) == 1)
  }
}
