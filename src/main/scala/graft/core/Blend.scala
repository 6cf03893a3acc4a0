package graft.core

/** Raster composition — the `gdal raster blend` operator surface
  * (apps/gdalalg_raster_blend.cpp, behavior only): Porter–Duff src-over
  * plus the Mapserver/SVG compositing family (multiply, screen, overlay,
  * hard-light, darken, lighten, color-dodge, color-burn) and the
  * hsv_merge-style hsv-value mode.
  *
  * All the byte arithmetic is replicated exactly:
  *  - MulScale255(a,b) = (a·b + 255) / 256 (ratio product, ceiling-biased —
  *    apps/gdalalg_raster_blend.cpp:183);
  *  - DivScale255(a,b) = 0 if a=0, 255 if b=0, else floor(a·255 / b)
  *    (:230), with the C++ implicit GByte conversion of its first argument
  *    (int sums wrap mod 256) preserved via `byte()`;
  *  - opacity percent → 255-scale: (pct·255 + 50) / 100 (:2792);
  *  - overlay alpha for an alpha-less overlay is the opacity byte, base
  *    alpha defaults 255, final alpha = Sa + Da − Sa·Da
  *    (ProcessAlphaChannels, :193);
  *  - channels are premultiplied by their alpha before the per-mode
  *    formula and un-premultiplied by DivScale255(·, finalAlpha) (:254);
  *  - the RGBA src-over fast path un-premultiplies through the
  *    gTabInvDstA reciprocal table: inv(k) = (255·256 + k/2)/k,
  *    out = (c·inv + 255) >> 8 (:833,1755);
  *  - hard-light = overlay with the two inputs' roles AND the opacity
  *    side swapped (:1158);
  *  - hsv-value recomputes value from the overlay band through float32
  *    rgb→hs / hs+v→rgb (:1004 rgb_to_hs, hsv_to_rgb — note GDAL's
  *    hue/saturation stay in [0,1], value in [0,255]).
  *
  * Like the reference (which swaps inputs so RGB sits on the base side
  * and tracks `bSwappedOpacity`), the caller is responsible for input
  * ordering; these kernels implement the canonical orientation.
  */
object Blend {

  val Modes: Seq[String] = Seq("src-over", "multiply", "screen", "overlay",
    "hard-light", "darken", "lighten", "color-dodge", "color-burn")

  /** (a·b + 255) / 256 with the C++ GByte argument conversion. */
  @inline def mul255(a: Int, b: Int): Int = ((a & 0xFF) * (b & 0xFF) + 255) / 256

  /** Ratio division; first argument wraps to byte like the C++ implicit
    * GByte conversion of the int sums callers pass in. */
  @inline def div255(a0: Int, b0: Int): Int = {
    val a = a0 & 0xFF; val b = b0 & 0xFF
    if (a == 0) 0 else if (b == 0) 255 else (a * 255) / b
  }

  /** CLI opacity percent (0–100) → 255-scale byte. */
  def opacityScale(pct: Int): Int = {
    require(pct >= 0 && pct <= 100, s"opacity $pct outside [0,100]")
    (pct * 255 + 50) / 100
  }

  /** Gray×gray blend, alpha-less inputs (base alpha 255, overlay alpha =
    * the opacity byte — the degenerate ProcessAlphaChannels case, where
    * finalAlpha is provably 255 because MulScale255(x,255)=x). */
  def blendGray(base: Array[Int], overlay: Array[Int], mode: String, op255: Int): Array[Int] = {
    require(base.length == overlay.length, "blend inputs must have equal size")
    val n = base.length
    val out = new Array[Int](n)
    val oa = op255 & 0xFF
    var i = 0
    mode match {
      case "src-over" =>
        // SrcOverRGB / BlendSrcOverRGBA_Generic collapsed at A=Sa=255:
        // dst = (overlay·op + src·(255−op) + 255)/256, dstA = 255 → identity
        while (i < n) {
          out(i) = (overlay(i) * oa + base(i) * (255 - oa) + 255) / 256
          i += 1
        }
      case _ =>
        while (i < n) {
          val c = base(i)                                // premult by A=255: unchanged
          val ocRaw = overlay(i)
          val oc = if (oa == 255) ocRaw else mul255(ocRaw, oa)
          out(i) = div255(grayComponent(mode, c, oc, oa), 255)
          i += 1
        }
    }
    out
  }

  /** One component of the Mapserver generic formulas at base alpha A=255,
    * overlay alpha OA=oa, premultiplied channels (c, oc). Returns the raw
    * int sum — the caller's div255 applies the GByte wrap exactly like the
    * C++ implicit conversion at the DivScale255 call site. */
  private def grayComponent(mode: String, c: Int, oc: Int, oa: Int): Int = {
    val a = 255
    // recurring terms: Sca.(1 - Da) and Dca.(1 - Sa)
    val cTimes1MinusOa = mul255(c, 255 - oa)
    val ocTimes1MinusA = mul255(oc, 255 - a)
    mode match {
      case "multiply" =>
        mul255(c, oc) + cTimes1MinusOa + ocTimes1MinusA
      case "screen" =>
        c + oc - mul255(c, oc)
      case "overlay" =>
        val alphaMul = mul255(oa, a)
        if (2 * c < a) 2 * mul255(c, oc) + cTimes1MinusOa + ocTimes1MinusA
        else alphaMul - 2 * mul255(a - c, oa - oc) + cTimes1MinusOa + ocTimes1MinusA
      case "hard-light" =>
        // overlay with roles + opacity side swapped: the premultiplied
        // overlay (oc, alpha oa) becomes the base of the overlay formula,
        // the raw base (c, alpha 255) becomes its overlay.
        val alphaMul = mul255(255, oa)
        val hT1 = mul255(oc, 255 - 255) // Sca.(1-Da) with Da=255
        val hT2 = mul255(c, 255 - oa)   // Dca.(1-Sa) with Sa=oa
        if (2 * oc < oa) 2 * mul255(oc, c) + hT1 + hT2
        else alphaMul - 2 * mul255(oa - oc, 255 - c) + hT1 + hT2
      case "darken" =>
        math.min(mul255(oc, a), mul255(c, oa)) + cTimes1MinusOa + ocTimes1MinusA
      case "lighten" =>
        math.max(mul255(oc, a), mul255(c, oa)) + cTimes1MinusOa + ocTimes1MinusA
      case "color-dodge" =>
        val alphaMul = mul255(oa, a)
        if (mul255(oc, a) + mul255(c, oa) >= alphaMul)
          alphaMul + cTimes1MinusOa + ocTimes1MinusA
        else
          div255(mul255(c, oa), 255 - div255(oc, oa)) + cTimes1MinusOa + ocTimes1MinusA
      case "color-burn" =>
        val alphaMul = mul255(oa, a)
        if (mul255(oc, a) + mul255(c, oa) <= alphaMul)
          cTimes1MinusOa + ocTimes1MinusA
        else {
          val cUn = div255(c, a)
          val ocUn = div255(oc, oa)
          mul255(alphaMul, cUn + ocUn - 255) + cTimes1MinusOa + ocTimes1MinusA
        }
      case bad => throw new IllegalArgumentException(s"unknown blend mode $bad")
    }
  }

  /** RGBA×RGBA src-over — the reference's SIMD hot path, scalar-exact
    * (BlendSrcOverRGBA_Generic incl. the gTabInvDstA rounding). Returns
    * (r, g, b, a) planes. */
  def srcOverRgba(r: Array[Int], g: Array[Int], b: Array[Int], a: Array[Int],
                  or: Array[Int], og: Array[Int], ob: Array[Int], oa: Array[Int],
                  op255: Int): (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val n = r.length
    val outR = new Array[Int](n); val outG = new Array[Int](n)
    val outB = new Array[Int](n); val outA = new Array[Int](n)
    var i = 0
    while (i < n) {
      val ovA = (oa(i) * op255 + 255) / 256
      val srcAMul = (a(i) * (255 - ovA) + 255) / 256
      val dstA = ovA + srcAMul
      val inv = if (dstA == 0) 0 else (255 * 256 + dstA / 2) / dstA
      @inline def ch(c: Int, oc: Int): Int = {
        val premul = (oc * ovA + c * srcAMul + 255) / 256
        ((premul * inv + 255) >> 8) & 0xFF
      }
      outR(i) = ch(r(i), or(i)); outG(i) = ch(g(i), og(i)); outB(i) = ch(b(i), ob(i))
      outA(i) = dstA
      i += 1
    }
    (outR, outG, outB, outA)
  }

  /** rgb → (hue, saturation) in [0,1], float32 exactly as the reference. */
  def rgbToHs(r: Int, g: Int, b: Int): (Float, Float) = {
    val (minc, maxc) =
      if (r <= g) { if (r <= b) (r, math.max(g, b)) else (b, g) }
      else { if (g <= b) (g, math.max(r, b)) else (b, r) }
    val mm = maxc - minc
    val s = mm / math.max(1, maxc).toFloat
    val mm6 = if (mm == 0) 1.0f else 6.0f * mm
    val h =
      if (maxc == b) 4.0f / 6.0f + (r - g) / mm6
      else if (maxc == g) 2.0f / 6.0f + (b - r) / mm6
      else { val t = (g - b) / mm6; if (t < 0.0f) t + 1.0f else t }
    (h, s)
  }

  /** (h, s in [0,1]; v in [0,255]) → rgb bytes, float32 as the reference
    * (derived from hsv_merge.py; +0.5f truncating casts). */
  def hsvToRgb(h: Float, s: Float, v: Int): (Int, Int, Int) = {
    val i = (6.0f * h).toInt
    val f = 6.0f * h - i
    val p = (v * (1.0f - s) + 0.5f).toInt
    val q = (v * (1.0f - s * f) + 0.5f).toInt
    val t = (v * (1.0f - s * (1.0f - f)) + 0.5f).toInt
    def pick(a0: Int, a1: Int, a2: Int, a3: Int, a4: Int, a5: Int): Int = i match {
      case 0 => a0; case 1 => a1; case 2 => a2; case 3 => a3; case 4 => a4; case _ => a5
    }
    (pick(v, q, p, p, t, v), pick(t, v, v, q, p, p), pick(p, p, t, v, v, q))
  }

  /** hsv-value mode: keep the base RGB's hue/saturation, take the value
    * (brightness) from the overlay band. Full-opacity path only, like the
    * reference's dedicated branch (requires opacity 100%). */
  def hsvValue(r: Array[Int], g: Array[Int], b: Array[Int], value: Array[Int])
  : (Array[Int], Array[Int], Array[Int]) = {
    val n = r.length
    val outR = new Array[Int](n); val outG = new Array[Int](n); val outB = new Array[Int](n)
    var i = 0
    while (i < n) {
      val (h, s) = rgbToHs(r(i), g(i), b(i))
      val (rr, gg, bb) = hsvToRgb(h, s, value(i))
      outR(i) = rr; outG(i) = gg; outB(i) = bb
      i += 1
    }
    (outR, outG, outB)
  }
}
