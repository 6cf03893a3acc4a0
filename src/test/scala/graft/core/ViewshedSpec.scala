package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ViewshedSpec extends AnyFunSuite {
  private val W = 33
  private val C = 16

  private def flat(v: Int) = Array.fill(W * W)(v)

  private def ring(dw: Int, wallH: Int): Array[Int] = {
    val dem = flat(0)
    for (y <- 0 until W; x <- 0 until W)
      if (math.max(math.abs(x - C), math.abs(y - C)) == dw) dem(y * W + x) = wallH
    dem
  }

  test("flat DEM with an elevated observer sees everything") {
    val vis = Viewshed.viewshed(flat(5), W, W, C, C, observerHeight = 2.0)
    assert(vis.forall(_ == 255))
  }

  test("square ring wall: visible iff Chebyshev distance <= ring distance") {
    // Margins are structural (see q98 oracle derivation): interior cells
    // keep adjusted height exactly -obsH and minZ = -obsH*j/(j-1), margin
    // >= obsH/(j-1); behind-wall minZ >= (wallH-obsH)*j/(j-1) >> -obsH.
    for (dw <- 3 to 7; wallH <- Seq(22, 40, 62)) {
      val vis = Viewshed.viewshed(ring(dw, wallH), W, W, C, C, observerHeight = 2.0)
      for (y <- 0 until W; x <- 0 until W) {
        val cheb = math.max(math.abs(x - C), math.abs(y - C))
        val want = if (cheb <= dw) 255 else 0
        assert(vis(y * W + x) == want,
          s"dw=$dw wallH=$wallH cell ($x,$y) cheb=$cheb: got ${vis(y * W + x)}")
      }
    }
  }

  test("single wall column casts an exact axis shadow") {
    val dem = flat(0)
    dem(C * W + (C + 5)) = 50 // wall on the +x axis at distance 5
    val vis = Viewshed.viewshed(dem, W, W, C, C, observerHeight = 2.0)
    for (x <- C + 1 until W) {
      val want = if (x - C <= 5) 255 else 0
      assert(vis(C * W + x) == want, s"axis x=$x")
    }
    // other axes unaffected
    for (x <- 0 until C) assert(vis(C * W + x) == 255)
    for (y <- 0 until W if y != C) assert(vis(y * W + C) == 255)
  }

  test("axis propagation matches the exact-rational 1-D max-gradient rule") {
    // pseudo-random integer DEM; obsH=2 keeps adjusted heights integral,
    // so the classic rule evaluates in exact BigInt rationals
    val dem = Array.tabulate(W * W)(i => ((i * 37 + (i / W) * 101) % 23))
    val vis = Viewshed.viewshed(dem, W, W, C, C, observerHeight = 2.0)
    val z0 = dem(C * W + C) + 2
    def adj(x: Int, y: Int): BigInt = BigInt(dem(y * W + x) - z0)
    def visibleExact(cells: Seq[(Int, Int)]): Seq[Option[Boolean]] = {
      // cell d visible iff adj(d)/1 >= max_{k<d} adj(k)/k (as fractions);
      // None on an exact tie (float recurrence direction is unspecified)
      var maxN = BigInt(0); var maxD = BigInt(0) // -inf as 0/0 sentinel
      cells.zipWithIndex.map { case ((x, y), i0) =>
        val d = i0 + 1
        val a = adj(x, y)
        val res =
          if (d == 1) Some(true)
          else {
            val cmp = (a * maxD) - (maxN * d) // sign of adj(d) - d*max
            if (cmp == 0) None else Some(cmp > 0)
          }
        // fold this cell into the running max of adj(k)/k
        if (maxD == 0 || a * maxD > maxN * d) { maxN = a; maxD = BigInt(d) }
        res
      }
    }
    val rays = Seq(
      (1 to C).map(d => (C + d, C)), (1 to C).map(d => (C - d, C)),
      (1 to C).map(d => (C, C + d)), (1 to C).map(d => (C, C - d)),
      (1 to C).map(d => (C + d, C + d)), (1 to C).map(d => (C - d, C - d)),
      (1 to C).map(d => (C + d, C - d)), (1 to C).map(d => (C - d, C + d)))
    for (ray <- rays) {
      val exact = visibleExact(ray)
      ray.zip(exact).foreach {
        case ((x, y), Some(want)) =>
          assert((vis(y * W + x) == 255) == want, s"ray cell ($x,$y)")
        case _ => // exact tie: either verdict acceptable
      }
    }
  }

  test("lineOfSight agrees with the viewshed map") {
    val dem = flat(0)
    dem(C * W + (C + 4)) = 50
    assert(Viewshed.lineOfSight(dem, W, W, C, C, C + 3, C))
    assert(!Viewshed.lineOfSight(dem, W, W, C, C, C + 9, C))
  }

  test("observer at a corner still covers the raster") {
    val vis = Viewshed.viewshed(flat(3), W, W, 0, 0, observerHeight = 2.0)
    assert(vis.forall(_ == 255))
  }

  test("input validation") {
    assertThrows[IllegalArgumentException] {
      Viewshed.viewshed(flat(0), W, W, -1, 0)
    }
    assertThrows[IllegalArgumentException] {
      Viewshed.viewshed(Array(1, 2, 3), 2, 2, 0, 0)
    }
  }
}
