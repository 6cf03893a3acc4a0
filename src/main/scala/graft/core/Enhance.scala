package graft.core

/** Histogram-equalization enhancement (the reference's gdalenhance app).
  *
  * Behavioral reference: apps/gdalenhance.cpp ComputeEqualizationLUTs
  * (:373-470) + EnhancerCallback (:478-545):
  *  - per-band default histogram (Byte: 256 buckets over [−0.5, 255.5]),
  *    with the extreme buckets zeroed (nodata guard, :412-413);
  *  - cumulative histogram with the half-bucket offset
  *    cum[i] = Σ_{j<i} h[j] + h[i]/2 (integer division, :427-430);
  *  - LUT: lut[i] = clamp((cum[(i·histSize)/nLUTBins]·nLUTBins)/total,
  *    0, nLUTBins−1) — pure integer arithmetic (:454-462);
  *  - application: bin = clamp(⌊(v − scaleMin)·bins/(max−min)⌋, 0,
  *    bins−1); for Byte with the default scale this reduces to
  *    out = lut[v] (:511-541).
  *
  * The reference computes the histogram with bApproxOK = TRUE (sampled
  * on large rasters); this port counts exactly — per-image rasters are
  * task-sized here, and exactness is what makes the q128 oracle closed
  * form. nLUTBins = 256 (the app default).
  */
object Enhance {
  val LutBins = 256

  /** Raw 256-bin histogram of one Byte band (no extreme zeroing — the
    * matching input, unlike the equalization histogram above). */
  def bandHistogram(band: Array[Int]): Array[Long] = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < band.length) { hist(band(i) & 0xff) += 1; i += 1 }
    hist
  }

  /** Histogram-MATCHING LUT against a reference (corpus) histogram:
    * lut[b] = min{ g : C[g]·ti ≥ c[b]·tc } — each image level maps to the
    * smallest reference level whose CDF share reaches the image's CDF
    * share, decided by exact int64 cross-multiplication (never a
    * floating-point quantile). c is nondecreasing, so the minimal g is
    * nondecreasing too and one two-pointer pass builds the whole LUT.
    *
    * Overflow bound: needs tc·ti < 2^63 (corpus pixels × image pixels).
    * Fails fast past it — at corpora beyond ~2^50 pixels, pre-scale the
    * corpus histogram (e.g. proportional reduction to ppm) and keep the
    * same compare. */
  def matchLut(hist: Array[Long], corpus: Array[Long]): Array[Int] = {
    require(hist.length == 256 && corpus.length == 256, "256-bin histograms")
    val c = new Array[Long](256)
    val cum = new Array[Long](256)
    var ti = 0L
    var tc = 0L
    var i = 0
    while (i < 256) { ti += hist(i); c(i) = ti; tc += corpus(i); cum(i) = tc; i += 1 }
    require(tc == 0 || ti == 0 || ti <= Long.MaxValue / tc,
      "histogram-match cross-multiply would overflow int64 — normalize the corpus histogram first")
    val lut = new Array[Int](256)
    var g = 0
    i = 0
    while (i < 256) {
      while (g < 255 && cum(g) * ti < c(i) * tc) g += 1
      lut(i) = g
      i += 1
    }
    lut
  }

  /** Equalization LUT of one Byte band. */
  def equalizationLut(band: Array[Int]): Array[Int] = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < band.length) { hist(band(i) & 0xff) += 1; i += 1 }
    hist(0) = 0
    hist(255) = 0
    val cum = new Array[Long](256)
    var total = 0L
    i = 0
    while (i < 256) {
      cum(i) = total + hist(i) / 2
      total += hist(i)
      i += 1
    }
    if (total == 0) total = 1
    val lut = new Array[Int](LutBins)
    i = 0
    while (i < LutBins) {
      val iHist = ((i.toLong * 256) / LutBins).toInt
      val v = ((cum(iHist) * LutBins) / total).toInt
      lut(i) = math.max(0, math.min(LutBins - 1, v))
      i += 1
    }
    lut
  }

  /** Equalize a Byte band in place semantics (returns a new array):
    * out = lut[bin(v)] with the Byte default scale (bin(v) = v). */
  def equalize(band: Array[Int]): Array[Int] = {
    val lut = equalizationLut(band)
    band.map(v => lut(math.max(0, math.min(255, v))))
  }
}
