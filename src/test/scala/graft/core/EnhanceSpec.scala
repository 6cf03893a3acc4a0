package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Histogram equalization vs apps/gdalenhance.cpp semantics. */
class EnhanceSpec extends AnyFunSuite {

  test("hand-computed 4-pixel LUT") {
    // band = [10, 10, 20, 30]: hist {10:2, 20:1, 30:1}, total 4
    // cum[10] = 0 + 2/2 = 1; cum[20] = 2 + 0 = 2; cum[30] = 3 + 0 = 3
    // lut[10] = (1*256)/4 = 64; lut[20] = 128; lut[30] = 192
    val lut = Enhance.equalizationLut(Array(10, 10, 20, 30))
    assert(lut(10) == 64 && lut(20) == 128 && lut(30) == 192)
    assert(Enhance.equalize(Array(10, 10, 20, 30)).toSeq == Seq(64, 64, 128, 192))
  }

  test("extreme buckets are zeroed before the cumulative") {
    // values 0 and 255 contribute nothing; the only counted value is 128
    val lut = Enhance.equalizationLut(Array(0, 0, 255, 128))
    // cum[128] = 1/2 = 0 → lut[128] = 0; everything below 128 also 0
    assert(lut(128) == 0 && lut(0) == 0)
    // above 128 the cumulative is 1 → (1*256)/1 = 256 → clamped 255
    assert(lut(200) == 255)
  }

  test("a uniform histogram maps ~linearly") {
    val band = Array.tabulate(256 * 4)(i => (i / 4) % 256)
    val lut = Enhance.equalizationLut(band)
    // counted total = 254*4 (extremes zeroed); lut must be non-decreasing
    assert(lut.toSeq == lut.toSeq.sorted)
    // midpoint lands near mid-range
    assert(math.abs(lut(128) - 128) <= 2)
  }

  test("an all-constant band maps everything at/above the value to 255") {
    // hist {100: n}; cum[100] = n/2 → lut[100] = clamp(128) = 128
    val lut = Enhance.equalizationLut(Array.fill(64)(100))
    assert(lut(100) == 128)
    assert(lut(101) == 255 && lut(99) == 0)
  }
}
