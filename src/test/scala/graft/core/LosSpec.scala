package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Line-of-sight vs alg/los.cpp GDALIsLineOfSightVisible behavior. */
class LosSpec extends AnyFunSuite {

  private def flat(w: Int, h: Int, v: Int = 0): Array[Int] = Array.fill(w * h)(v)

  test("flat terrain is visible in every direction") {
    val b = flat(9, 9)
    assert(Los.isVisible(b, 9, 9, 0, 0, 1.0, 8, 8, 1.0) == ((true, -1, -1)))
    assert(Los.isVisible(b, 9, 9, 4, 0, 1.0, 4, 8, 1.0) == ((true, -1, -1)))
    assert(Los.isVisible(b, 9, 9, 0, 4, 1.0, 8, 4, 1.0) == ((true, -1, -1)))
  }

  test("coincident endpoints above terrain are visible") {
    val b = flat(3, 3, 5)
    assert(Los.isVisible(b, 3, 3, 1, 1, 5.0, 1, 1, 5.0) == ((true, -1, -1)))
    assert(Los.isVisible(b, 3, 3, 1, 1, 4.0, 1, 1, 4.0) == ((false, 1, 1)))
  }

  test("a blocked endpoint is reported before any walk hit (A, then B)") {
    val b = flat(9, 1)
    b(4) = 10 // wall mid-line
    b(8) = 10 // wall under B
    // B below its terrain: reported as (8,0) even though cell 4 blocks earlier
    assert(Los.isVisible(b, 9, 1, 0, 0, 1.0, 8, 0, 1.0) == ((false, 8, 0)))
    // A below its terrain wins over everything
    val b2 = flat(9, 1); b2(0) = 10; b2(4) = 10
    assert(Los.isVisible(b2, 9, 1, 0, 0, 1.0, 8, 0, 1.0) == ((false, 0, 0)))
  }

  test("horizontal line: first wall cell in walk order is the intersection") {
    val b = flat(9, 1)
    b(3) = 10; b(6) = 10
    assert(Los.isVisible(b, 9, 1, 0, 0, 2.0, 8, 0, 2.0) == ((false, 3, 0)))
    // walking the other way hits cell 6 first
    assert(Los.isVisible(b, 9, 1, 8, 0, 2.0, 0, 0, 2.0) == ((false, 6, 0)))
  }

  test("linear z interpolation clears a ramp the constant height cannot") {
    // terrain rises toward B; z lerps from 0 at A to 10 at B
    val b = Array.tabulate(11)(x => x) // terrain = x
    assert(Los.isVisible(b, 11, 1, 0, 0, 0.0, 10, 0, 10.0) == ((true, -1, -1)))
    // but a bump above the ray blocks at its cell
    val b2 = b.clone(); b2(5) = 6 // ray z at x=5 is 5.0 < 6
    assert(Los.isVisible(b2, 11, 1, 0, 0, 0.0, 10, 0, 10.0) == ((false, 5, 0)))
    // bump exactly at ray height passes (z >= terrain)
    val b3 = b.clone(); b3(5) = 5
    assert(Los.isVisible(b3, 11, 1, 0, 0, 0.0, 10, 0, 10.0) == ((true, -1, -1)))
  }

  test("diagonal Bresenham walk matches the reference stepping") {
    // 45° diagonal: path is exactly the diagonal cells
    val w = 8
    val b = flat(w, w)
    b(3 * w + 3) = 9
    assert(Los.isVisible(b, w, w, 0, 0, 1.0, 7, 7, 1.0) == ((false, 3, 3)))
    // shallow line from (0,0) to (7,2): Bresenham steps y at x=2,5 with
    // balance init 2·dy − dx = −3 (reference alg/los.cpp:37 variant)
    val path = Seq((0, 0), (1, 0), (2, 1), (3, 1), (4, 1), (5, 1), (6, 2), (7, 2))
    path.foreach { case (px, py) =>
      val bb = flat(w, w); bb(py * w + px) = 9
      val (vis, ix, iy) = Los.isVisible(bb, w, w, 0, 0, 1.0, 7, 2, 1.0)
      assert(!vis && (ix, iy) == ((px, py)), s"wall at ($px,$py) → got ($ix,$iy)")
    }
    // a cell OFF the path never blocks
    val bb = flat(w, w); bb(0 * w + 3) = 9 // (3,0) not on path
    assert(Los.isVisible(bb, w, w, 0, 0, 1.0, 7, 2, 1.0)._1)
  }

  test("steep lines step the minor x axis by the mirrored balance rule") {
    val w = 8
    val path = Seq((0, 0), (0, 1), (1, 2), (1, 3), (1, 4), (1, 5), (2, 6), (2, 7))
    path.foreach { case (px, py) =>
      val bb = flat(w, w); bb(py * w + px) = 9
      val (vis, ix, iy) = Los.isVisible(bb, w, w, 0, 0, 1.0, 2, 7, 1.0)
      assert(!vis && (ix, iy) == ((px, py)), s"wall at ($px,$py) → got ($ix,$iy)")
    }
  }

  test("sqrt-ratio z interpolation on the diagonal") {
    // diagonal (0,0,z=0) → (4,4,z=8): at (2,2) ratio = 0.5 exactly → z = 4
    val w = 5
    val b = flat(w, w)
    b(2 * w + 2) = 4
    assert(Los.isVisible(b, w, w, 0, 0, 0.0, 4, 4, 8.0)._1) // 4 >= 4
    b(2 * w + 2) = 5
    assert(Los.isVisible(b, w, w, 0, 0, 0.0, 4, 4, 8.0) == ((false, 2, 2)))
  }
}
