package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pansharpen / median-cut / dither kernels (alg/gdalpansharpen.cpp:588,
  * alg/gdalmediancut.cpp, alg/gdaldither.cpp behavior). */
class ColorSpec extends AnyFunSuite {

  test("brovey pansharpen of constant bands reproduces the pan value") {
    val ms = Raster(4, 4, Array(Array.fill(16)(60), Array.fill(16)(60), Array.fill(16)(60)))
    val pan = Array.fill(64)(180)
    val out = Color.pansharpen(pan, 8, 8, ms, Array(1.0 / 3, 1.0 / 3, 1.0 / 3))
    // pseudoPan = 60 → ratio 3 → every band becomes 180
    assert(out.bands.forall(_.forall(_ == 180)))
  }

  test("brovey preserves band ratios") {
    val ms = Raster(2, 2, Array(Array.fill(4)(40), Array.fill(4)(80), Array.fill(4)(120)))
    val pan = Array.fill(16)(160)
    val out = Color.pansharpen(pan, 4, 4, ms, Array(1.0 / 3, 1.0 / 3, 1.0 / 3))
    // pseudo = 80, ratio = 2 → bands 80/160/240
    assert(out.bands(0).forall(_ == 80))
    assert(out.bands(1).forall(_ == 160))
    assert(out.bands(2).forall(_ == 240))
  }

  test("median cut splits the widest axis and respects the color budget") {
    // two clusters → 2 colors recover the cluster means
    val n = 32
    val reds = Array.fill(n)((200, 10, 10))
    val blues = Array.fill(n)((10, 10, 200))
    val px = reds ++ blues
    val r = Raster(8, 8, Array(px.map(_._1), px.map(_._2), px.map(_._3)))
    val pal = Color.medianCutPalette(r, 2)
    assert(pal.length == 2)
    assert(pal.toSet == Set((200, 10, 10), (10, 10, 200)))
    // budget respected for rich images
    val rnd = new scala.util.Random(1)
    val rich = Raster(16, 16, Array.fill(3)(Array.fill(256)(rnd.nextInt(256))))
    assert(Color.medianCutPalette(rich, 16).length <= 16)
    // constant image → single color regardless of budget
    val const = Raster(4, 4, Array.fill(3)(Array.fill(16)(77)))
    assert(Color.medianCutPalette(const, 16).toSeq == Seq((77, 77, 77)))
  }

  test("dither maps exact palette colors to themselves and bounds mean error") {
    val rnd = new scala.util.Random(9)
    val r = Raster(16, 16, Array.fill(3)(Array.fill(256)(rnd.nextInt(256))))
    val pal = Color.medianCutPalette(r, 16)
    val idx = Color.ditherFS(r, pal)
    assert(idx.forall(i => i >= 0 && i < pal.length))
    // a constant image equal to a palette color dithers losslessly
    val c = pal(0)
    val flat = Raster(8, 8, Array(Array.fill(64)(c._1), Array.fill(64)(c._2), Array.fill(64)(c._3)))
    val fi = Color.ditherFS(flat, pal)
    assert(fi.forall(_ == 0) || fi.forall(i => pal(i) == c))
    // error diffusion keeps the dithered mean close to the true mean
    val meanTrue = r.bands(0).sum.toDouble / 256
    val meanDithered = idx.map(i => pal(i)._1).sum.toDouble / 256
    assert(math.abs(meanTrue - meanDithered) < 12.0,
      s"mean drifted: $meanTrue vs $meanDithered")
  }
}
