package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Hexagonal cell index (q170): the cube-round must assign every point
  * to its NEAREST hex center (the defining property of hex binning),
  * pack/unpack must roundtrip, and the six neighbors must sit at one
  * hex-diameter from the center. */
class HexSpec extends AnyFunSuite {
  private val Size = 4.0

  private def dist2(ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = ax - bx; val dy = ay - by; dx * dx + dy * dy
  }

  test("hexOf assigns the nearest hex center (vs brute force over a 5x5 axial patch)") {
    val rnd = new scala.util.Random(23)
    (1 to 2000).foreach { _ =>
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 170.0 - 85.0
      val id = Hex.hexOf(lon, lat, Size)
      val (cx, cy) = Hex.center(id, Size)
      val q = Hex.unpackQ(id); val r = Hex.unpackR(id)
      val d0 = dist2(lon, lat, cx, cy)
      for (dq <- -2 to 2; dr <- -2 to 2 if dq != 0 || dr != 0) {
        val (ox, oy) = Hex.center(Hex.pack(q + dq, r + dr), Size)
        val d1 = dist2(lon, lat, ox, oy)
        // strict nearest up to float wiggle at exact cell borders
        assert(d1 >= d0 - 1e-9, s"($lon, $lat): neighbor ($dq,$dr) closer: $d1 < $d0")
      }
    }
  }

  test("pack/unpack roundtrip incl. negatives; out-of-range fails loudly") {
    for (q <- Seq(-100000L, -1L, 0L, 1L, 524287L); r <- Seq(-524287L, 0L, 99999L)) {
      val id = Hex.pack(q, r)
      assert(Hex.unpackQ(id) == q && Hex.unpackR(id) == r)
    }
    assertThrows[IllegalArgumentException](Hex.pack(1L << 19, 0L))
  }

  test("the six neighbors are all at exactly one hex distance (sqrt(3)*size)") {
    val id = Hex.pack(10, -4)
    val (cx, cy) = Hex.center(id, Size)
    val nbrs = Hex.neighbors(id)
    assert(nbrs.size == 6 && nbrs.distinct.size == 6)
    nbrs.foreach { n =>
      val (nx, ny) = Hex.center(n, Size)
      val d = math.sqrt(dist2(cx, cy, nx, ny))
      assert(math.abs(d - math.sqrt(3.0) * Size) < 1e-9, s"neighbor distance $d")
    }
  }

  test("coverCenters recall: every point's hex is in its box's cover (random boxes)") {
    val rnd = new scala.util.Random(41)
    (1 to 200).foreach { _ =>
      val minx = rnd.nextDouble() * 300 - 180
      val miny = rnd.nextDouble() * 150 - 85
      val maxx = minx + rnd.nextDouble() * 60
      val maxy = miny + rnd.nextDouble() * 30
      val cover = Hex.coverCenters(minx, miny, maxx, maxy, Size).toSet
      (1 to 20).foreach { _ =>
        val lon = minx + rnd.nextDouble() * (maxx - minx)
        val lat = miny + rnd.nextDouble() * (maxy - miny)
        assert(cover.contains(Hex.hexOf(lon, lat, Size)),
          s"point ($lon, $lat) hex missing from cover of [$minx,$miny,$maxx,$maxy]")
      }
      // tightness sanity: cover is O(area/hex-area), not wildly padded
      val hexArea = 3.0 * math.sqrt(3.0) / 2.0 * Size * Size
      val boxArea = (maxx - minx + 4 * Size) * (maxy - miny + 4 * Size)
      assert(cover.size <= boxArea / hexArea * 2 + 16, s"cover too large: ${cover.size}")
    }
  }

  test("points near a shared edge split between exactly the two adjacent hexes") {
    // walk across the border between hex (0,0) and its +q neighbor
    val a = Hex.pack(0, 0); val b = Hex.pack(1, 0)
    val (ax, ay) = Hex.center(a, Size); val (bx, by) = Hex.center(b, Size)
    (1 to 99).foreach { i =>
      val t = i / 100.0
      val lon = ax + (bx - ax) * t; val lat = ay + (by - ay) * t
      val id = Hex.hexOf(lon, lat, Size)
      // the exact midpoint tie-break is pinned: the cube-round's strict
      // `dx > dy` comparisons keep the FIRST candidate (hex a) on ties
      val expect = if (t <= 0.5) a else b
      assert(id == expect,
        s"t=$t landed in (${Hex.unpackQ(id)},${Hex.unpackR(id)})")
    }
  }
}
