package graft.core

/** Bit-exact reimplementation of the reference's 16-bit image checksum
  * (alg/gdalchecksum.cpp:48 GDALChecksumImage) — the correctness oracle
  * tying our raster outputs to the reference autotest constants (e.g.
  * byte.tif → 4672, autotest/gcore/tiff_read.py:45).
  *
  * Semantics replicated from the reference's integer path:
  *   primes = {7,11,13,17,19,23,29,31,37,41,43}
  *   iPrime for pixel (x,y) = (y*w + x) % 11  (full-line iteration order)
  *   checksum += value % primes[iPrime];  checksum &= 0xffff per line
  * and the float path: value → int via +0.5, clamp ±2147483647, floor
  * (gdalchecksum.cpp:88-101 IntFromDouble); non-finite → INT_MIN.
  * C truncated `%` on negatives matches Java/Scala `%` exactly.
  */
object GdalChecksum {
  private val Primes = Array(7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43)

  /** Checksum of an integer-valued band given as an int array, row-major. */
  def ofInts(pixels: Array[Int], w: Int, h: Int): Int = {
    var checksum = 0
    var iPrime = 0
    var y = 0
    var idx = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        checksum += pixels(idx) % Primes(iPrime)
        iPrime += 1
        if (iPrime > 10) iPrime = 0
        x += 1
        idx += 1
      }
      checksum &= 0xFFFF
      y += 1
    }
    checksum
  }

  /** Checksum of a Byte band stored as signed JVM bytes (values 0..255). */
  def ofBytes(pixels: Array[Byte], w: Int, h: Int): Int = {
    var checksum = 0
    var iPrime = 0
    var y = 0
    var idx = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        checksum += (pixels(idx) & 0xFF) % Primes(iPrime)
        iPrime += 1
        if (iPrime > 10) iPrime = 0
        x += 1
        idx += 1
      }
      checksum &= 0xFFFF
      y += 1
    }
    checksum
  }

  /** Float/double band path (reference IntFromDouble conversion). */
  def ofDoubles(pixels: Array[Double], w: Int, h: Int): Int = {
    var checksum = 0
    var iPrime = 0
    var y = 0
    var idx = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        checksum += intFromDouble(pixels(idx)) % Primes(iPrime)
        iPrime += 1
        if (iPrime > 10) iPrime = 0
        x += 1
        idx += 1
      }
      checksum &= 0xFFFF
      y += 1
    }
    checksum
  }

  def intFromDouble(v: Double): Int = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) Int.MinValue
    else {
      val d = v + 0.5
      if (d < -2147483647.0) -2147483647
      else if (d > 2147483647.0) 2147483647
      else math.floor(d).toInt
    }
  }
}
