package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Sieve / proximity-EDT / fill-nodata kernels (alg/gdalsievefilter.cpp:178,
  * alg/gdalproximity.cpp:94, alg/rasterfill.cpp semantics). */
class MorphSpec extends AnyFunSuite {

  test("label finds 4- and 8-connected components") {
    // two diagonal 1-pixels: separate under 4-conn, joined under 8-conn
    val b = Array(
      1, 0, 0,
      0, 1, 0,
      0, 0, 0)
    val (_, s4) = Morph.label(b, 3, 3, connect8 = false)
    assert(s4.length == 3) // background is 4-connected around the diagonal
    val (_, s8) = Morph.label(b, 3, 3, connect8 = true)
    assert(s8.length == 2)
  }

  test("sieve merges small specks into the largest neighbour") {
    // 8x8 field of 5s with a 2-pixel speck of 9 and a large 3x3 block of 7
    val b = Array.fill(64)(5)
    b(1 * 8 + 1) = 9; b(1 * 8 + 2) = 9
    for (y <- 4 to 6; x <- 4 to 6) b(y * 8 + x) = 7
    val out = Morph.sieve(b, 8, 8, threshold = 4, connect8 = false)
    assert(out(1 * 8 + 1) == 5 && out(1 * 8 + 2) == 5, "speck absorbed into field")
    assert(out(5 * 8 + 5) == 7, "block >= threshold survives")
    // total pixel count preserved
    assert(out.length == 64 && out.count(_ == 7) == 9)
  }

  test("sieve resolves chains of small components") {
    // small A next to small B next to big C: A and B both end up as C
    val b = Array.fill(8 * 3)(1)
    b(0) = 8; b(1) = 9; b(2) = 9 // A(size1) B(size2), rest C(size 21)
    val out = Morph.sieve(b, 8, 3, threshold = 4, connect8 = false)
    assert(out.forall(_ == 1))
  }

  test("edt2 equals brute-force squared distances") {
    val rnd = new scala.util.Random(5)
    val w = 17; val h = 13
    val b = Array.fill(w * h)(if (rnd.nextDouble() < 0.1) 1 else 0)
    if (!b.contains(1)) b(7) = 1
    val d2 = Morph.edt2(b, w, h, _ == 1)
    val targets = for (i <- b.indices if b(i) == 1) yield (i % w, i / w)
    for (y <- 0 until h; x <- 0 until w) {
      val brute = targets.map { case (tx, ty) =>
        ((x - tx) * (x - tx) + (y - ty) * (y - ty)).toDouble
      }.min
      assert(d2(y * w + x) == brute, s"at ($x,$y)")
    }
  }

  test("fillNodata reconstructs a ramp hole within tolerance and fills counts") {
    val w = 16; val h = 16
    val ramp = Array.tabulate(w * h)(i => (i % w) * 3 + (i / w) * 2)
    val holed = ramp.clone()
    val nodata = -1
    for (y <- 6 to 9; x <- 6 to 9) holed(y * w + x) = nodata
    val filled = Morph.fillNodata(holed, w, h, nodata, maxDist = 8)
    assert(!filled.contains(nodata))
    for (y <- 6 to 9; x <- 6 to 9) {
      val d = math.abs(filled(y * w + x) - ramp(y * w + x))
      assert(d <= 3, s"hole fill at ($x,$y) off by $d")
    }
    // untouched pixels are identical
    for (i <- 0 until w * h if holed(i) != nodata) assert(filled(i) == holed(i))
  }

  test("fillNodata leaves unreachable holes when maxDist is too small") {
    val b = Array.fill(32 * 32)(-1)
    b(0) = 42 // single valid pixel far from center
    val filled = Morph.fillNodata(b, 32, 32, -1, maxDist = 2)
    assert(filled(16 * 32 + 16) == -1, "centre stays nodata")
    assert(filled(1 * 32 + 1) == 42, "diagonal neighbour filled")
  }
}
