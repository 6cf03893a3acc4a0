package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BlendSpec extends AnyFunSuite {

  private val allPairs: Seq[(Int, Int)] =
    for { c <- 0 to 255 by 3; o <- 0 to 255 by 5 } yield (c, o)

  private def one(mode: String, base: Int, ovl: Int, op255: Int): Int =
    Blend.blendGray(Array(base), Array(ovl), mode, op255).head

  test("opacity 0 is the identity for every mode") {
    for (m <- Blend.Modes; (c, o) <- allPairs)
      assert(one(m, c, o, 0) == c, s"$m($c,$o)")
  }

  test("src-over at opacity 100 returns the overlay; multiply is the classic product") {
    for ((c, o) <- allPairs) {
      assert(one("src-over", c, o, 255) == o)
      assert(one("multiply", c, o, 255) == Blend.mul255(c, o))
    }
  }

  /** Independent float model: the normalized Mapserver compositing algebra
    * (Sa = opacity, Da = 1, premultiplied channels), against which the
    * byte pipeline must stay within its accumulated rounding (each
    * MulScale255/DivScale255 is within 1/255). */
  private def floatModel(mode: String, c0: Int, o0: Int, op255: Int): Double = {
    val d = c0 / 255.0                 // Dca (Da = 1)
    val sa = op255 / 255.0
    val s = (o0 / 255.0) * sa          // Sca premultiplied
    val res = mode match {
      case "src-over" => s + d * (1 - sa)
      case "multiply" => s * d + s * 0 + d * (1 - sa)
      case "screen" => s + d - s * d
      case "overlay" =>
        if (2 * d < 1) 2 * s * d + d * (1 - sa)
        else sa - 2 * (1 - d) * (sa - s) + d * (1 - sa)
      case "hard-light" =>
        if (2 * s < sa) 2 * s * d + d * (1 - sa)
        else sa - 2 * (sa - s) * (1 - d) + d * (1 - sa)
      case "darken" => math.min(s, d * sa) + d * (1 - sa)
      case "lighten" => math.max(s, d * sa) + d * (1 - sa)
      case "color-dodge" =>
        if (s + d * sa >= sa) sa + d * (1 - sa)
        else d * sa / (1 - s / sa) + d * (1 - sa)
      case "color-burn" =>
        if (s + d * sa <= sa) d * (1 - sa)
        else sa * (d + s / sa - 1) + d * (1 - sa)
    }
    res * 255.0
  }

  test("every byte-exact mode tracks the normalized float compositing model") {
    for (m <- Blend.Modes; op <- Seq(64, 153, 255); (c, o) <- allPairs) {
      // color-dodge divides by (1 - Sca/Sa): near the singularity the
      // byte quantization of the numerator amplifies unboundedly (the
      // reference behaves identically) — skip that sliver of the domain
      // byte error ≈ ±255/(255−o) in the dodge lt-branch: bound it ≤ 8
      val denom = 1.0 - (o / 255.0)
      if (!(m == "color-dodge" && denom < 0.15)) {
        val got = one(m, c, o, op)
        val want = floatModel(m, c, o, op)
        // each MulScale255 deviates from the ideal ·/255 by up to ~1 count;
        // overlay/hard-light double one term, color-dodge/burn divide —
        // rounding compounds accordingly
        val tol = if (m.startsWith("color-")) 8.0 else 4.0
        assert(math.abs(got - want) <= tol, s"$m($c,$o,op=$op): byte=$got float=$want")
      }
    }
  }

  test("opacity percent scaling matches the CLI rounding") {
    assert(Blend.opacityScale(0) == 0)
    assert(Blend.opacityScale(100) == 255)
    assert(Blend.opacityScale(60) == 153)
    assert(Blend.opacityScale(50) == 128) // (50*255 + 50)/100 rounds half up
    intercept[IllegalArgumentException](Blend.opacityScale(101))
  }

  test("srcOverRgba: opaque full-opacity returns the overlay; zero overlay alpha keeps the base") {
    val base = Array(10, 200, 30)
    val ovl = Array(250, 5, 99)
    val a255 = Array(255, 255, 255)
    val (r1, _, _, a1) = Blend.srcOverRgba(base, base, base, a255, ovl, ovl, ovl, a255, 255)
    assert(r1.toSeq == ovl.toSeq && a1.forall(_ == 255))
    val a0 = Array(0, 0, 0)
    val (r2, _, _, a2) = Blend.srcOverRgba(base, base, base, a255, ovl, ovl, ovl, a0, 255)
    assert(r2.toSeq == base.toSeq && a2.forall(_ == 255))
  }

  test("srcOverRgba invDstA rounding matches long division within 1") {
    // the table is inv(k) = (255*256 + k/2)/k; unpremultiply must agree
    // with exact (c*255)/dstA to within one count for in-gamut pixels
    for (c <- 0 to 255 by 7; a <- 1 to 255 by 7; if c <= a) {
      val inv = (255 * 256 + a / 2) / a
      val fast = ((c * inv + 255) >> 8) & 0xFF
      val exact = (c * 255 + a / 2) / a
      assert(math.abs(fast - exact) <= 1, s"c=$c a=$a fast=$fast exact=$exact")
    }
  }

  test("hsv-value: gray base takes the overlay value verbatim; pure hues keep hue") {
    val (r, g, b) = Blend.hsvValue(Array(77), Array(77), Array(77), Array(200))
    assert((r(0), g(0), b(0)) == ((200, 200, 200)))
    // pure red at value 128 stays pure red
    val (r2, g2, b2) = Blend.hsvValue(Array(255), Array(0), Array(0), Array(128))
    assert((r2(0), g2(0), b2(0)) == ((128, 0, 0)))
    // pure green / blue
    val (r3, g3, b3) = Blend.hsvValue(Array(0), Array(255), Array(0), Array(64))
    assert((r3(0), g3(0), b3(0)) == ((0, 64, 0)))
    val (r4, g4, b4) = Blend.hsvValue(Array(0), Array(0), Array(255), Array(250))
    assert((r4(0), g4(0), b4(0)) == ((0, 0, 250)))
  }

  test("hsv roundtrip: value=maxc reproduces the input color to within 1") {
    for (r <- 0 to 255 by 17; g <- 0 to 255 by 23; b <- 0 to 255 by 29) {
      val (h, s) = Blend.rgbToHs(r, g, b)
      val v = math.max(r, math.max(g, b))
      val (rr, gg, bb) = Blend.hsvToRgb(h, s, v)
      assert(math.abs(rr - r) <= 1 && math.abs(gg - g) <= 1 && math.abs(bb - b) <= 1,
        s"($r,$g,$b) -> ($rr,$gg,$bb)")
    }
  }

  test("GByte wraps survive: color-burn's unpremultiplied sum may go negative") {
    // force c + div(oc,oa) - 255 < 0 while the gt branch is taken:
    // needs oc + mul(c,oa) > oa with small c — exercised across the sweep;
    // assert no exception and byte-range output everywhere
    for (op <- Seq(1, 128, 254); (c, o) <- allPairs) {
      val out = one("color-burn", c, o, op)
      assert(out >= 0 && out <= 255)
    }
  }
}
