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

  test("matchLut matches the brute-force min-g rule and self-matches to identity") {
    def brute(hist: Array[Long], corpus: Array[Long]): Array[Int] = {
      val c = hist.scanLeft(0L)(_ + _).tail
      val cg = corpus.scanLeft(0L)(_ + _).tail
      val ti = c(255); val tc = cg(255)
      Array.tabulate(256)(b => (0 to 255).find(g => cg(g) * ti >= c(b) * tc).getOrElse(255))
    }
    val rnd = new scala.util.Random(7)
    val hist = Array.fill(256)(rnd.nextInt(50).toLong)
    val corpus = Array.fill(256)(rnd.nextInt(900).toLong)
    assert(Enhance.matchLut(hist, corpus).toSeq == brute(hist, corpus).toSeq)
    // matching a histogram against itself: every occupied level maps to
    // itself (C = c, so min g with c(g) >= c(b) is b for occupied b)
    val self = Enhance.matchLut(hist.map(_ + 1), hist.map(_ + 1)) // all bins occupied
    assert(self.toSeq == (0 to 255).toSeq)
    // empty corpus → all-zero LUT, no crash
    assert(Enhance.matchLut(hist, new Array[Long](256)).forall(_ == 0))
  }

  test("an all-constant band maps everything at/above the value to 255") {
    // hist {100: n}; cum[100] = n/2 → lut[100] = clamp(128) = 128
    val lut = Enhance.equalizationLut(Array.fill(64)(100))
    assert(lut(100) == 128)
    assert(lut(101) == 255 && lut(99) == 0)
  }
}
