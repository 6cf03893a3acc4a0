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
