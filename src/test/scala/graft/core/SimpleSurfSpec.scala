package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SURF correlator vs alg/gdal_simplesurf.cpp + gdal_octave.cpp behavior. */
class SimpleSurfSpec extends AnyFunSuite {

  private val W = 96

  /** The q125 fixture scene: an L-shaped blob and a staircase blob of
    * 255s on a 0 background, both offset by (ox, oy). */
  def scene(cx: Int, cy: Int, ox: Int, oy: Int): Array[Double] = {
    val img = new Array[Int](W * W)
    def sq(x0: Int, y0: Int, w: Int, h: Int): Unit =
      for (y <- y0 until y0 + h; x <- x0 until x0 + w) img((y + oy) * W + (x + ox)) = 255
    sq(cx - 4, cy - 3, 7, 7) // 7×7 block...
    for (y <- cy - 3 to cy - 1; x <- cx - 1 to cx + 2) img((y + oy) * W + (x + ox)) = 0 // ...minus notch = L
    val bx = cx - 2; val by = cy + 16
    sq(bx, by, 4, 4); sq(bx + 3, by + 3, 4, 4); sq(bx + 6, by + 6, 4, 4)
    SimpleSurf.luminosity(Array(img), W, W)
  }

  private def pts(cx: Int, cy: Int, ox: Int, oy: Int) =
    SimpleSurf.extract(new SimpleSurf.Integral(scene(cx, cy, ox, oy), W, W), 1, 1, 0.001)

  test("the fixture scene yields at least two feature points") {
    val p = pts(33, 33, 0, 0)
    info(s"points: ${p.map(q => (q.x, q.y, q.scale, q.sign)).mkString(", ")}")
    assert(p.length >= 2)
  }

  test("extraction is translation-equivariant for interior windows") {
    val base = pts(33, 33, 0, 0)
    val shifted = pts(33, 33, 5, 4)
    assert(base.length == shifted.length)
    base.zip(shifted).foreach { case (a, b) =>
      assert(b.x - a.x == 5 && b.y - a.y == 4 && a.scale == b.scale && a.sign == b.sign)
    }
  }

  test("matching recovers the translation for every fixture key") {
    for (k <- 0 until 25) {
      val cx = 30 + k % 7; val cy = 30 + (k * 3) % 7
      val dx = 3 + k % 5; val dy = 2 + (k * 7) % 5
      val a = pts(cx, cy, 0, 0)
      val b = pts(cx, cy, dx, dy)
      val m = SimpleSurf.matchPoints(a, b, 1.0)
      assert(m.nonEmpty, s"k=$k no matches")
      m.foreach { case (i, j, _) =>
        assert(b(j).x - a(i).x == dx && b(j).y - a(i).y == dy,
          s"k=$k expected ($dx,$dy) got (${b(j).x - a(i).x},${b(j).y - a(i).y})")
      }
    }
  }

  test("integral image rectangle sums match direct summation") {
    val rnd = new scala.util.Random(7)
    val w = 17; val h = 13
    val img = Array.fill(w * h)(rnd.nextInt(10).toDouble)
    val ii = new SimpleSurf.Integral(img, w, h)
    def direct(r0: Int, c0: Int, rw: Int, rh: Int): Double = {
      var s = 0.0
      for (r <- math.max(0, r0) until math.min(h, r0 + rh);
           c <- math.max(0, c0) until math.min(w, c0 + rw)) s += img(r * w + c)
      s
    }
    for (r0 <- -2 to 12 by 3; c0 <- -2 to 16 by 3; rw <- 1 to 7 by 3; rh <- 1 to 7 by 2) {
      assert(math.abs(ii.rectSum(r0, c0, rw, rh) - direct(r0, c0, rw, rh)) < 1e-9,
        s"rect ($r0,$c0,$rw,$rh)")
    }
  }

  test("ratio test rejects ambiguous matches") {
    // two identical points in the second set: best/second-best ratio = 1
    val d = Array.fill(64)(1.0)
    val p = SimpleSurf.FeaturePoint(0, 0, 2, 9, 1, d)
    val m = SimpleSurf.matchPoints(Array(p), Array(p, p), 1.0)
    assert(m.isEmpty)
  }

  test("sign gate: opposite-Laplacian points never match") {
    val d = Array.fill(64)(1.0)
    val a = SimpleSurf.FeaturePoint(0, 0, 2, 9, 1, d)
    val b = SimpleSurf.FeaturePoint(0, 0, 2, 9, -1, d)
    assert(SimpleSurf.matchPoints(Array(a), Array(b, b), 1.0).isEmpty)
  }
}
