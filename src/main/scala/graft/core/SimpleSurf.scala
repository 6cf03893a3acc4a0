package graft.core

/** SURF-style feature detection and cross-image point matching — the
  * reference's image correlator.
  *
  * Behavioral references:
  *  - integral image: alg/gdal_octave.cpp GDALIntegralImage (:32-118) —
  *    prefix-sum build, out-of-range Get = 0, GetRectangleSum with the
  *    reference's border clamping and the ≥0 floor;
  *  - octave layers: GDALOctaveLayer::ComputeLayer (:156-215) — Fast
  *    Hessian box filters (filterSize = 3·2^oct·interval + 1), responses
  *    normalized by filterSize², det = dxx·dyy − 0.9²·dxy², Laplacian
  *    sign = sign(dxx + dyy);
  *  - extremum test: GDALOctaveMap::PointIsExtremum (:248-285) — strict
  *    3×3×3 maximum over (bot, mid, top) interval layers, above
  *    threshold, inside the top layer's radius margin;
  *  - descriptor: alg/gdal_simplesurf.cpp SetDescriptor (:313-364) —
  *    4×4 quadrants × 5×5 sub-quadrants of Haar wavelet responses at
  *    size 2·scale over a 20·scale window, [Σdx, Σdy, Σ|dx|, Σ|dy|] per
  *    quadrant = 64 doubles;
  *  - luminosity: ConvertRGBToLuminosity (:147-235) —
  *    (0.21·R + 0.72·G + 0.07·B)/255;
  *  - matching: MatchFeaturePoints (:369-521) — greedy nearest-neighbor
  *    from the smaller collection, same Laplacian sign only, Lowe ratio
  *    test at 0.8, distances normalized by the max, kept ≤ threshold.
  *
  * Distribution shape: extraction is a per-row kernel (one image per
  * task); matching runs per candidate PAIR — pair generation at corpus
  * scale goes through the phash/banding candidate operators, never
  * all-pairs.
  */
object SimpleSurf {

  final val Intervals = 4
  final val DescSize = 64

  /** One detected point: position, scale, Laplacian sign, descriptor. */
  final case class FeaturePoint(x: Int, y: Int, scale: Int, radius: Int,
                                sign: Int, desc: Array[Double])

  /** Integral image with the reference's exact lookup semantics. */
  final class Integral(img: Array[Double], val w: Int, val h: Int) {
    private val m = new Array[Double](w * h)
    locally {
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) {
          val a = if (i >= 1 && j >= 1) m((i - 1) * w + (j - 1)) else 0.0
          val b = if (j >= 1) m(i * w + (j - 1)) else 0.0
          val c = if (i >= 1) m((i - 1) * w + j) else 0.0
          m(i * w + j) = img(i * w + j) - a + b + c
          j += 1
        }
        i += 1
      }
    }

    @inline private def get(r: Int, c: Int): Double =
      if (r >= 0 && r < h && c >= 0 && c < w) m(r * w + c) else 0.0

    /** Rectangle sum from its left-top point, mirroring the reference's
      * clamping (gdal_octave.cpp:82-118) including the ≥ 0 floor. */
    def rectSum(row: Int, col: Int, rw: Int, rh: Int): Double = {
      val ltRow = if (row <= h) row - 1 else -1
      val ltCol = if (col <= w) col - 1 else -1
      val rbRow = if (row + rh - 1 < h) row + rh - 1 else h - 1
      val rbCol = if (col + rw - 1 < w) col + rw - 1 else w - 1
      val a = if (ltRow >= 0 && ltCol >= 0) get(ltRow, ltCol) else 0.0
      val b = if (ltRow >= 0 && rbCol >= 0) get(ltRow, rbCol) else 0.0
      val c = if (rbRow >= 0 && rbCol >= 0) get(rbRow, rbCol) else 0.0
      val d = if (rbRow >= 0 && ltCol >= 0) get(rbRow, ltCol) else 0.0
      val res = a + c - b - d
      if (res > 0) res else 0.0
    }

    def haarX(row: Int, col: Int, size: Int): Double =
      rectSum(row, col + size / 2, size / 2, size) - rectSum(row, col, size / 2, size)

    def haarY(row: Int, col: Int, size: Int): Double =
      rectSum(row + size / 2, col, size, size / 2) - rectSum(row, col, size, size / 2)
  }

  /** (0.21·R + 0.72·G + 0.07·B)/255 luminosity plane; a single band is
    * treated as R = G = B. */
  def luminosity(bands: Array[Array[Int]], w: Int, h: Int): Array[Double] = {
    val r = bands(0)
    val g = if (bands.length > 1) bands(1) else bands(0)
    val b = if (bands.length > 2) bands(2) else bands(0)
    val out = new Array[Double](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = (r(i) * 0.21 + g(i) * 0.72 + b(i) * 0.07) / 255.0
      i += 1
    }
    out
  }

  /** One octave layer of Fast-Hessian responses. */
  private final class Layer(octave: Int, interval: Int, img: Integral) {
    val filterSize: Int = 3 * (1 << octave) * interval + 1
    val radius: Int = (filterSize - 1) / 2
    val scale: Int = 1 << octave
    val w: Int = img.w
    val h: Int = img.h
    val det = new Array[Double](w * h)
    val sgn = new Array[Byte](w * h)
    locally {
      val lobe = filterSize / 3
      val longPart = 2 * lobe - 1
      val norm = filterSize * filterSize
      var r = radius
      while (r <= h - radius) {
        var c = radius
        while (c <= w - radius) {
          var dxx = img.rectSum(r - lobe + 1, c - radius, filterSize, longPart) -
            3 * img.rectSum(r - lobe + 1, c - (lobe - 1) / 2, lobe, longPart)
          var dyy = img.rectSum(r - radius, c - lobe - 1, longPart, filterSize) -
            3 * img.rectSum(r - lobe + 1, c - lobe + 1, longPart, lobe)
          var dxy = img.rectSum(r - lobe, c - lobe, lobe, lobe) +
            img.rectSum(r + 1, c + 1, lobe, lobe) -
            img.rectSum(r - lobe, c + 1, lobe, lobe) -
            img.rectSum(r + 1, c - lobe, lobe, lobe)
          dxx /= norm; dyy /= norm; dxy /= norm
          det(r * w + c) = dxx * dyy - 0.9 * 0.9 * dxy * dxy
          sgn(r * w + c) = if (dxx + dyy >= 0) 1 else -1
          c += 1
        }
        r += 1
      }
    }
  }

  private def isExtremum(row: Int, col: Int, bot: Layer, mid: Layer, top: Layer,
                         threshold: Double): Boolean = {
    if (row <= top.radius || col <= top.radius ||
      row + top.radius >= top.h || col + top.radius >= top.w) return false
    val w = mid.w
    val cur = mid.det(row * w + col)
    if (cur < threshold) return false
    var i = -1
    while (i <= 1) {
      var j = -1
      while (j <= 1) {
        val k = (row + i) * w + (col + j)
        if (top.det(k) >= cur || bot.det(k) >= cur) return false
        if ((i != 0 || j != 0) && mid.det(k) >= cur) return false
        j += 1
      }
      i += 1
    }
    true
  }

  private def descriptor(x: Int, y: Int, scale: Int, img: Integral): Array[Double] = {
    val haarFilterSize = 2 * scale
    val descSide = 20 * scale
    val quadStep = descSide / 4
    val subQuadStep = quadStep / 5
    val ltRow = y - descSide / 2
    val ltCol = x - descSide / 2
    val desc = new Array[Double](DescSize)
    var count = 0
    var r = ltRow
    while (r < ltRow + descSide) {
      var c = ltCol
      while (c < ltCol + descSide) {
        var dx = 0.0; var dy = 0.0; var adx = 0.0; var ady = 0.0
        var sr = r
        while (sr < r + quadStep) {
          var sc = c
          while (sc < c + quadStep) {
            val curR = sr + subQuadStep / 2 - haarFilterSize / 2
            val curC = sc + subQuadStep / 2 - haarFilterSize / 2
            val cdx = img.haarX(curR, curC, haarFilterSize)
            val cdy = img.haarY(curR, curC, haarFilterSize)
            dx += cdx; dy += cdy
            adx += math.abs(cdx); ady += math.abs(cdy)
            sc += subQuadStep
          }
          sr += subQuadStep
        }
        desc(count) = dx; desc(count + 1) = dy
        desc(count + 2) = adx; desc(count + 3) = ady
        count += 4
        c += quadStep
      }
      r += quadStep
    }
    desc
  }

  /** Detect feature points over octaves [octaveStart, octaveEnd]. */
  def extract(img: Integral, octaveStart: Int, octaveEnd: Int,
              threshold: Double): Array[FeaturePoint] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FeaturePoint]
    var oct = octaveStart
    while (oct <= octaveEnd) {
      val layers = Array.tabulate(Intervals)(i => new Layer(oct, i + 1, img))
      var k = 0
      while (k < Intervals - 2) {
        val bot = layers(k); val mid = layers(k + 1); val top = layers(k + 2)
        var i = 0
        while (i < mid.h) {
          var j = 0
          while (j < mid.w) {
            if (isExtremum(i, j, bot, mid, top, threshold)) {
              out += FeaturePoint(j, i, mid.scale, mid.radius,
                mid.sgn(i * mid.w + j), descriptor(j, i, mid.scale, img))
            }
            j += 1
          }
          i += 1
        }
        k += 1
      }
      oct += 1
    }
    out.toArray
  }

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < DescSize) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** Greedy sign-gated NN matching with the 0.8 ratio test and the
    * normalized-distance threshold; returns (idxFirst, idxSecond, dist)
    * with dist normalized by the max accepted pre-threshold distance. */
  def matchPoints(first: Array[FeaturePoint], second: Array[FeaturePoint],
                  threshold: Double): Array[(Int, Int, Double)] = {
    val ratioThreshold = 0.8
    val swap = second.length < first.length
    val p1 = if (swap) second else first
    val p2 = if (swap) first else second
    val matched = new Array[Boolean](p2.length)
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    var i = 0
    while (i < p1.length) {
      var bestDist = -1.0; var bestIdx = -1; var bestDist2 = -1.0
      var j = 0
      while (j < p2.length) {
        if (!matched(j) && p1(i).sign == p2(j).sign) {
          val cur = dist(p1(i).desc, p2(j).desc)
          if (bestDist == -1 || cur < bestDist) { bestDist = cur; bestIdx = j }
          if (bestDist2 < 0) bestDist2 = cur
          else if (cur > bestDist && cur < bestDist2) bestDist2 = cur
        }
        j += 1
      }
      if (bestDist2 > 0 && bestDist >= 0 && bestDist / bestDist2 < ratioThreshold) {
        pairs += ((i, bestIdx, bestDist))
        matched(bestIdx) = true
      }
      i += 1
    }
    var max = 0.0
    pairs.foreach(p => if (p._3 > max) max = p._3)
    val normed = if (max != 0.0) pairs.map(p => (p._1, p._2, p._3 / max)) else pairs
    normed.filter(_._3 <= threshold)
      .map(p => if (swap) (p._2, p._1, p._3) else p)
      .toArray
  }
}
