package graft.core

/** Ear-clipping triangulation of simple polygons (the published
  * O(n²) ear-removal construction). Purpose: GENERALIZE the overlay
  * kernel — core.Clip operates on convex clip regions, and any simple
  * polygon decomposes into triangles (all convex), so intersection/
  * difference/union against arbitrary polygons reduce to sequences of
  * convex operations with EXACT piecewise results (triangles partition
  * the polygon; no overlap, no gap).
  */
object Triangulate {

  /** Triangulate one simple ring (closed, no self-intersection, no
    * holes) into triangles, each as a closed 4-point ring. Collinear
    * (zero-area) corners are dropped. */
  def earClip(ring0: Array[Double]): Array[Array[Double]] = {
    // working vertex list, open (no closing duplicate), normalized CCW
    var ring = ring0
    if (!Clip.isCcw(ring)) ring = Clip.reverseRing(ring)
    val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ys = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < ring.length - 2) {
      val x = ring(i); val y = ring(i + 1)
      if (xs.isEmpty || xs.last != x || ys.last != y) { xs += x; ys += y }
      i += 2
    }
    if (xs.length >= 2 && xs.head == xs.last && ys.head == ys.last) {
      xs.remove(xs.length - 1); ys.remove(ys.length - 1)
    }

    @inline def cross(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    @inline def inTri(px: Double, py: Double,
                      ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Boolean = {
      val d1 = cross(ax, ay, bx, by, px, py)
      val d2 = cross(bx, by, cx, cy, px, py)
      val d3 = cross(cx, cy, ax, ay, px, py)
      (d1 > 0 && d2 > 0 && d3 > 0) || (d1 >= 0 && d2 >= 0 && d3 >= 0 && d1 + d2 + d3 > 0)
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var guard = 0
    val guardMax = 4 * math.max(4, xs.length * xs.length)
    while (xs.length > 3 && guard < guardMax) {
      guard += 1
      val n = xs.length
      var earFound = false
      var k = 0
      while (k < n && !earFound) {
        val p = (k + n - 1) % n
        val q = (k + 1) % n
        val c = cross(xs(p), ys(p), xs(k), ys(k), xs(q), ys(q))
        if (c == 0.0) {
          // collinear corner: remove outright (degenerate ear)
          xs.remove(k); ys.remove(k)
          earFound = true
        } else if (c > 0.0) {
          // convex corner: an ear iff no other vertex sits inside
          var contains = false
          var m = 0
          while (m < n && !contains) {
            if (m != p && m != k && m != q &&
              inTri(xs(m), ys(m), xs(p), ys(p), xs(k), ys(k), xs(q), ys(q))) contains = true
            m += 1
          }
          if (!contains) {
            out += Array(xs(p), ys(p), xs(k), ys(k), xs(q), ys(q), xs(p), ys(p))
            xs.remove(k); ys.remove(k)
            earFound = true
          }
        }
        k += 1
      }
      if (!earFound) {
        // numerically stuck (near-degenerate input): emit a fan and stop
        var f = 1
        while (f < xs.length - 1) {
          out += Array(xs(0), ys(0), xs(f), ys(f), xs(f + 1), ys(f + 1), xs(0), ys(0))
          f += 1
        }
        xs.remove(3, xs.length - 3)
      }
    }
    if (xs.length == 3)
      out += Array(xs(0), ys(0), xs(1), ys(1), xs(2), ys(2), xs(0), ys(0))
    out.filter { t =>
      val maxAbs = t.map(math.abs).max
      GeomOps.ringArea(t) > 1e-12 * maxAbs * maxAbs
    }.toArray
  }

  /** Convex decomposition of any supported polygonal WKB: each polygon's
    * outer ring triangulates; holes (and every hole of every part)
    * subtract from the triangles via the convex-difference kernel, so
    * the returned pieces are convex, disjoint, and exactly cover the
    * geometry. Already-convex hole-free polygons pass through intact. */
  def convexPieces(wkb: Array[Byte]): Array[Array[Double]] = {
    val g = Wkb.read(wkb)
    require(g.polygons.nonEmpty, "convexPieces: areal geometry required")
    g.polygons.flatMap { poly =>
      val outer = poly.rings(0)
      val basePieces: Array[Array[Double]] =
        if (poly.rings.length == 1 && Clip.isConvexRing(outer)) Array(outer)
        else earClip(outer)
      // subtract holes (each hole triangulated into convex subtrahends)
      poly.rings.drop(1).foldLeft(basePieces) { (pieces, hole) =>
        val holeTris = if (Clip.isConvexRing(hole)) Array(hole) else earClip(hole)
        holeTris.foldLeft(pieces) { (ps, tri) =>
          val edges = Clip.convexEdges(tri)
          ps.flatMap(p => Clip.differencePolygon(Wkb.Polygon(Array(p)), edges).map(_.rings(0)))
        }
      }
    }
  }
}
