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
    // Riley: sqrt of sum of squared diffs — 4 orthogonal at 100², 4 diagonal 0
    val rir = Focal.triRiley(cb, 8, 8)
    assert(math.abs(rir(3 * 8 + 3) - math.sqrt(4.0 * 100 * 100)) < 1e-12)
  }

  test("slope_percent is 100·tan(slope_degrees) on a uniform ramp interior") {
    val ramp = plane(9, 9, (x, _) => 3 * x) // dz/dx = 3 per cell
    val pct = Focal.slopePercent(ramp, 9, 9, 1, 1)(4 * 9 + 4)
    val deg = Focal.slope(ramp, 9, 9, 1, 1)(4 * 9 + 4)
    assert(math.abs(pct - 300.0) < 1e-9)
    assert(math.abs(math.tan(math.toRadians(deg)) * 100.0 - pct) < 1e-9)
  }

  test("tri_riley matches a brute per-pixel mirror on a ramp with edges clamped") {
    val ramp = plane(6, 5, (x, y) => 3 * x + 7 * y)
    val got = Focal.triRiley(ramp, 6, 5)
    for (y <- 0 until 5; x <- 0 until 6) {
      def at(ix: Int, iy: Int) =
        ramp(math.min(4, math.max(0, iy)) * 6 + math.min(5, math.max(0, ix))).toDouble
      val c = at(x, y)
      val s = (for { dy <- -1 to 1; dx <- -1 to 1; if dx != 0 || dy != 0 }
        yield { val d = c - at(x + dx, y + dy); d * d }).sum
      assert(got(y * 6 + x) == math.sqrt(s), s"($x,$y)")
    }
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

  test("combined hillshade: flat surface saturates at 255, slope damps the shade") {
    // flat: slope term atan(0)=0 → shade 1 → 1+254 = 255 (unlike standard's ~181)
    val flat = plane(8, 8, (_, _) => 100)
    assert(Focal.hillshadeCombined(flat, 8, 8, 1, 1).forall(_ == 255))
    // a steep sun-facing ramp is darker combined than standard (acos·atan damping)
    val ramp = plane(9, 9, (x, y) => 4 * (x + y))
    val std = Focal.hillshade(ramp, 9, 9, 1, 1)
    val comb = Focal.hillshadeCombined(ramp, 9, 9, 1, 1)
    val c = 4 * 9 + 4
    assert(comb(c) < std(c), s"combined ${comb(c)} vs standard ${std(c)}")
    assert(comb.forall(v => v >= 0 && v <= 255))
  }

  test("multidirectional hillshade: flat takes the exact 1+254·sin(alt) branch") {
    val flat = plane(8, 8, (_, _) => 7)
    val md = Focal.hillshadeMultiDirectional(flat, 8, 8, 1, 1)
    val expect = math.round(1.0 + 254.0 * math.sin(math.toRadians(45.0))).toInt // 181
    assert(md.forall(_ == expect))
  }

  test("multidirectional hillshade blends azimuths: NW-facing brighter than SE-facing") {
    // z rises to the SE → faces NW: lit by the 315° component strongly
    val nw = plane(9, 9, (x, y) => 2 * (x + y))
    // z rises to the NW → faces SE: all four western/northern suns graze
    val se = plane(9, 9, (x, y) => 2 * ((8 - x) + (8 - y)))
    val a = Focal.hillshadeMultiDirectional(nw, 9, 9, 1, 1)(4 * 9 + 4)
    val b = Focal.hillshadeMultiDirectional(se, 9, 9, 1, 1)(4 * 9 + 4)
    assert(a > b, s"nw-facing $a should be brighter than se-facing $b")
  }

  test("hillshade floors fully-shadowed pixels at 1 (0 is reserved for nodata)") {
    // z rises steeply to the NW → faces SE, fully away from the 315° sun
    val se = plane(9, 9, (x, y) => 20 * ((8 - x) + (8 - y)))
    val hs = Focal.hillshade(se, 9, 9, 1, 1)
    assert(hs(4 * 9 + 4) == 1, s"shadowed pixel should floor at 1, got ${hs(4 * 9 + 4)}")
    assert(hs.forall(_ >= 1))
    val zt = Focal.hillshadeZT(se, 9, 9, 1, 1)
    assert(zt(4 * 9 + 4) == 1)
  }

  test("Zevenbergen-Thorne slope matches the analytic angle on a linear ramp") {
    // z = 2x: central difference (z(x-1) - z(x+1))/1 = -4, slope = atan(2)
    val b = plane(9, 9, (x, _) => 2 * x)
    val s = Focal.slopeZT(b, 9, 9, 1, 1)
    for (y <- 1 to 7; x <- 1 to 7)
      assert(math.abs(s(y * 9 + x) - math.toDegrees(math.atan(2.0))) < 1e-9, s"($x,$y)")
    // on a linear surface ZT and Horn agree
    val h = Focal.slope(b, 9, 9, 1, 1)
    assert(math.abs(s(4 * 9 + 4) - h(4 * 9 + 4)) < 1e-9)
  }

  test("Zevenbergen-Thorne aspect: east-rising faces west, flat is -9999") {
    val b = plane(9, 9, (x, _) => 2 * x)
    assert(math.abs(Focal.aspectZT(b, 9, 9)(4 * 9 + 4) - 270.0) < 1e-9)
    val flat = plane(5, 5, (_, _) => 3)
    assert(Focal.aspectZT(flat, 5, 5).forall(_ == -9999.0))
  }

  test("Zevenbergen-Thorne hillshade: flat surface shades like the standard kernel") {
    val flat = plane(8, 8, (_, _) => 50)
    val expect = math.round(1.0 + 254.0 * math.sin(math.toRadians(45.0))).toInt
    assert(Focal.hillshadeZT(flat, 8, 8, 1, 1).forall(_ == expect))
    assert(Focal.hillshade(flat, 8, 8, 1, 1).forall(_ == expect))
  }

  // --- color-relief (gdaldem color-relief, GDALColorReliefGetRGBA) ---

  private val ramp: Array[Double] = Array(
    0, 16, 32, 64, 255, /**/ 100, 0, 128, 0, 255, /**/ 200, 240, 100, 20, 128).map(_.toDouble)

  private def rgba(c: Int): (Int, Int, Int, Int) =
    ((c >>> 16) & 0xff, (c >>> 8) & 0xff, c & 0xff, (c >>> 24) & 0xff)

  test("color-relief clamps below/above ramp ends in every mode") {
    for (m <- Seq(Focal.ReliefInterpolate, Focal.ReliefNearest)) {
      assert(rgba(Focal.reliefColor(ramp, -50.0, m)) == ((16, 32, 64, 255)))
      assert(rgba(Focal.reliefColor(ramp, 300.0, m)) == ((240, 100, 20, 128)))
    }
    // exact mode: out-of-range non-matches are transparent black
    assert(Focal.reliefColor(ramp, -50.0, Focal.ReliefExact) == 0)
    assert(Focal.reliefColor(ramp, 300.0, Focal.ReliefExact) == 0)
    assert(rgba(Focal.reliefColor(ramp, 0.0, Focal.ReliefExact)) == ((16, 32, 64, 255)))
    assert(rgba(Focal.reliefColor(ramp, 200.0, Focal.ReliefExact)) == ((240, 100, 20, 128)))
  }

  test("color-relief exact matches return the entry; exact mode zeroes non-matches") {
    for (m <- Seq(Focal.ReliefInterpolate, Focal.ReliefNearest, Focal.ReliefExact))
      assert(rgba(Focal.reliefColor(ramp, 100.0, m)) == ((0, 128, 0, 255)), s"mode $m")
    assert(Focal.reliefColor(ramp, 99.5, Focal.ReliefExact) == 0)
  }

  test("color-relief interpolation blends with the reference's trunc(0.5 + ...)") {
    // v=25 between (0: r=16) and (100: r=0): ratio 0.25 → r = trunc(0.5+16-4)=12
    val (r, g, b, a) = rgba(Focal.reliefColor(ramp, 25.0, Focal.ReliefInterpolate))
    assert(r == 12)
    assert(g == (0.5 + 32 + 0.25 * (128 - 32)).toInt) // 56
    assert(b == (0.5 + 64 + 0.25 * (0 - 64)).toInt) // 48
    assert(a == 255)
    // midpoint of (100,200): each channel rounds half-up via the +0.5
    val (r2, _, _, a2) = rgba(Focal.reliefColor(ramp, 150.0, Focal.ReliefInterpolate))
    assert(r2 == (0.5 + 0 + 0.5 * 240).toInt) // 120
    assert(a2 == (0.5 + 255 + 0.5 * (128 - 255)).toInt) // trunc(191.5+ 0.5...)= 192
  }

  test("color-relief nearest ties to the upper entry (strict < rule)") {
    // 50 is equidistant from 0 and 100 → upper (0,128,0)
    assert(rgba(Focal.reliefColor(ramp, 50.0, Focal.ReliefNearest)) == ((0, 128, 0, 255)))
    assert(rgba(Focal.reliefColor(ramp, 49.0, Focal.ReliefNearest)) == ((16, 32, 64, 255)))
    assert(rgba(Focal.reliefColor(ramp, 51.0, Focal.ReliefNearest)) == ((0, 128, 0, 255)))
  }

  test("colorRelief planes agree with per-pixel reliefColor and reject bad ramps") {
    val band = plane(4, 4, (x, y) => x * 40 + y * 23)
    val (pr, pg, pb, pa) = Focal.colorRelief(band, ramp, Focal.ReliefInterpolate)
    for (i <- band.indices) {
      val (r, g, b, a) = rgba(Focal.reliefColor(ramp, band(i).toDouble, Focal.ReliefInterpolate))
      assert((pr(i), pg(i), pb(i), pa(i)) == ((r, g, b, a)), s"px $i v=${band(i)}")
    }
    intercept[IllegalArgumentException] {
      Focal.colorRelief(band, Array(10.0, 0, 0, 0, 255, 5.0, 1, 1, 1, 255), Focal.ReliefInterpolate)
    }
  }

  test("neighborStat min/max/median/stddev on a known 3x3 window") {
    // 4x4 ramp band; the interior pixel (1,1)'s window is the 9 values
    // {0,1,2, 4,5,6, 8,9,10} (z = x + 4y).
    val b = plane(4, 4, (x, y) => x + 4 * y)
    val win = Seq(0, 1, 2, 4, 5, 6, 8, 9, 10).map(_.toDouble)
    val i = 1 * 4 + 1
    assert(Focal.neighborStat(b, 4, 4, "min")(i) == 0.0)
    assert(Focal.neighborStat(b, 4, 4, "max")(i) == 10.0)
    assert(Focal.neighborStat(b, 4, 4, "median")(i) == win.sorted.apply(4))
    val mean = win.sum / 9
    val popSd = math.sqrt(win.map(v => (v - mean) * (v - mean)).sum / 9)
    assert(math.abs(Focal.neighborStat(b, 4, 4, "stddev")(i) - popSd) < 1e-12)
    intercept[IllegalArgumentException](Focal.neighborStat(b, 4, 4, "variance"))
  }

  test("neighborStat mode ties break to strictly-greater running count") {
    // Window at (1,1) of this 4x4 band visits, row-major:
    //   7 7 3 / 3 5 5 / 9 9 9  → 9 wins (count 3).
    val vals = Array(
      7, 7, 3, 0,
      3, 5, 5, 0,
      9, 9, 9, 0,
      0, 0, 0, 0)
    assert(Focal.neighborStat(vals, 4, 4, "mode")(1 * 4 + 1) == 9.0)
    // Tie between 7 (first to reach count 2 at visit 2) and later pairs:
    //   7 7 3 / 3 5 5 / 1 2 4 → 7 reaches 2 first; 3's and 5's second
    //   occurrences come later, and count never strictly exceeds 2.
    val tie = Array(
      7, 7, 3, 0,
      3, 5, 5, 0,
      1, 2, 4, 0,
      0, 0, 0, 0)
    assert(Focal.neighborStat(tie, 4, 4, "mode")(1 * 4 + 1) == 7.0)
  }

  test("neighborStat replicates borders: corner window of a constant is the constant") {
    val b = plane(4, 4, (x, y) => if (x == 0 && y == 0) 42 else 42)
    assert(Focal.neighborStat(b, 4, 4, "stddev")(0) == 0.0)
    assert(Focal.neighborStat(b, 4, 4, "mode")(0) == 42.0)
    // corner of a ramp: clamped window of (0,0) on z=x+4y is {0,0,1, 0,0,1, 4,4,5}
    val r = plane(4, 4, (x, y) => x + 4 * y)
    assert(Focal.neighborStat(r, 4, 4, "min")(0) == 0.0)
    assert(Focal.neighborStat(r, 4, 4, "max")(0) == 5.0)
    assert(Focal.neighborStat(r, 4, 4, "median")(0) == 1.0)
    assert(Focal.neighborStat(r, 4, 4, "mode")(0) == 0.0)
  }
}
