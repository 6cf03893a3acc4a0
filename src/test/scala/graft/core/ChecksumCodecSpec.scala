package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ChecksumCodecSpec extends AnyFunSuite {

  test("checksum reproduces the reference constant 4672 on byte.tif pixels") {
    assert(GdalChecksum.ofInts(RefFixtures.BytePixels, 20, 20) == RefFixtures.ByteChecksum)
  }

  test("checksum float path conversion rules") {
    assert(GdalChecksum.intFromDouble(1.4) == 1)
    assert(GdalChecksum.intFromDouble(1.5) == 2)
    assert(GdalChecksum.intFromDouble(-1.4) == -1) // -1.4+0.5=-0.9 → floor = -1
    assert(GdalChecksum.intFromDouble(-1.6) == -2)
    assert(GdalChecksum.intFromDouble(Double.NaN) == Int.MinValue)
    assert(GdalChecksum.intFromDouble(1e12) == 2147483647)
    assert(GdalChecksum.intFromDouble(-1e12) == -2147483647)
    val d = RefFixtures.BytePixels.map(_.toDouble)
    assert(GdalChecksum.ofDoubles(d, 20, 20) == RefFixtures.ByteChecksum)
  }

  test("checksum matches between byte and int forms") {
    val bytes = RefFixtures.BytePixels.map(_.toByte)
    assert(GdalChecksum.ofBytes(bytes, 20, 20) == RefFixtures.ByteChecksum)
  }

  private def pattern(i: Int, w: Int, h: Int, bands: Int): Raster = {
    val bs = Array.tabulate(bands) { _ =>
      val a = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) a(y * w + x) = (x * 7 + y * 13 + i * 31) % 256
      a
    }
    Raster(w, h, bs)
  }

  test("raw codec roundtrips exactly") {
    val r = pattern(3, 16, 20, 3)
    val enc = ImageCodec.encodeRaw(r)
    assert(enc.length == 16 * 20 * 3)
    val dec = ImageCodec.decodeRaw(enc, 16, 20)
    assert(dec.nBands == 3)
    assert(dec.bands(0).sameElements(r.bands(0)) && dec.bands(2).sameElements(r.bands(2)))
  }

  test("png codec roundtrips exactly (gray and rgb)") {
    val gray = pattern(5, 20, 20, 1)
    val decG = ImageCodec.decode(ImageCodec.encodePng(gray), "png", 20, 20)
    assert(decG.nBands == 1 && decG.bands(0).sameElements(gray.bands(0)))
    val rgb = pattern(7, 16, 16, 3)
    val decC = ImageCodec.decode(ImageCodec.encodePng(rgb), "png", 16, 16)
    assert(decC.nBands == 3)
    for (b <- 0 until 3) assert(decC.bands(b).sameElements(rgb.bands(b)), s"band $b")
  }

  test("jpeg round-trip clears PSNR >= 40 dB (corpus lossy invariant)") {
    val rgb = pattern(11, 64, 64, 3)
    val dec = ImageCodec.decode(ImageCodec.encodeJpeg(rgb), "jpeg", 64, 64)
    val p = ImageCodec.psnr(rgb, dec)
    assert(p >= 40.0, s"psnr $p")
  }

  test("psnr of identical rasters is infinite") {
    val r = pattern(1, 8, 8, 1)
    assert(ImageCodec.psnr(r, r).isPosInfinity)
  }
}
