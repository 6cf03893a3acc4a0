package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** nearblack (apps/nearblack_lib.cpp) collar-trim semantics. */
class NearBlackSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int, k: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 13 + k * 31) % 256)

  test("scanline algorithm matches the closed-form window mask at maxNonBlack=0") {
    for (k <- 0 until 6; dist <- Seq(15, 100); white <- Seq(false, true)) {
      val (w, h) = (16, 12)
      val band = pattern(w, h, k)
      val got = NearBlack.run(Array(band.clone()), w, h, dist, 0, white)
      val want = NearBlack.maskClosedForm(band, w, h, dist, white)
      assert(got.toSeq == want.toSeq, s"k=$k dist=$dist white=$white")
    }
  }

  test("single row, maxNonBlack=0: scan stops at the non-near pixel, resumes past it") {
    // [0,0,200,0,0,0]: vertical blackens every near pixel of a 1-row image;
    // horizontal re-enables after the 200 via the column-collar rule.
    val band = Array(0, 0, 200, 0, 0, 0)
    val out = band.clone()
    val mask = NearBlack.run(Array(out), 6, 1, 15, 0, white = false)
    assert(mask.toSeq == Seq(true, true, false, true, true, true))
    assert(out(2) == 200, "non-near pixel untouched")
  }

  test("single row, maxNonBlack=1: the lone non-near pixel is a grey area and is trimmed") {
    val band = Array(0, 0, 200, 0, 0, 0)
    val out = band.clone()
    val mask = NearBlack.run(Array(out), 6, 1, 15, 1, white = false)
    assert(mask.forall(identity), "grey-area bridging blackens the whole row")
    assert(out(2) == 0, "grey pixel replaced with the collar color")
  }

  test("a pixel is near only when EVERY band is near") {
    // band0 all near; band1 has one bright pixel -> that pixel is non-near
    val b0 = Array.fill(6)(0)
    val b1 = Array(0, 0, 200, 0, 0, 0)
    val mask = NearBlack.run(Array(b0, b1), 6, 1, 15, 0, white = false)
    assert(mask.toSeq == Seq(true, true, false, true, true, true))
  }

  test("near-white trims the 255 collar and replaces with 255") {
    val band = Array(255, 250, 40, 255, 255, 249)
    val out = band.clone()
    val mask = NearBlack.run(Array(out), 6, 1, 15, 0, white = true)
    assert(mask.toSeq == Seq(true, true, false, true, true, true))
    assert(out.toSeq == Seq(255, 255, 40, 255, 255, 255))
  }

  test("interior island survives; full border is trimmed") {
    // 5x5: border ring near-black, centre 3x3 bright
    val w = 5; val h = 5
    val band = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      if (x == 0 || y == 0 || x == w - 1 || y == h - 1) 5 else 210
    }
    val mask = NearBlack.run(Array(band.clone()), w, h, 15, 0, white = false)
    for (y <- 0 until h; x <- 0 until w) {
      val border = x == 0 || y == 0 || x == w - 1 || y == h - 1
      assert(mask(y * w + x) == border, s"($x,$y)")
    }
  }
}
