package graft.core

import scala.collection.mutable

/** Chi-shape concave hull over the Delaunay core (SURVEY.md §2.8 vector
  * ETL; reference: apps/gdalalg_vector_concave_hull.cpp, which delegates
  * to GEOS ConcaveHull — same maximum-edge-length-ratio contract:
  * ratio = 1 → convex hull, ratio → 0 → maximally concave). This is the
  * published chi-shape algorithm (Duckham et al. 2008), re-implemented
  * from the paper over graft's own Delaunay triangulation.
  *
  * Carving: boundary edges longer than lenMin + ratio·(lenMax − lenMin)
  * (length range over all Delaunay edges) are removed longest-first; a
  * removal is legal only while the exposed opposite vertex is still
  * interior, which keeps the boundary one simple ring throughout.
  * O(n log n) — per-geometry work, embarrassingly parallel across rows.
  */
object ConcaveHull {

  /** Closed hull ring (x0,y0,...,x0,y0) of the point set, or null when a
    * triangulation does not exist (n < 3, collinear, degenerate). */
  def hullRing(xs: Array[Double], ys: Array[Double], ratio: Double): Array[Double] = {
    val n = xs.length
    if (n < 3) return null
    val tri =
      try Delaunay.triangulate(xs, ys)
      catch { case _: IllegalArgumentException | _: IllegalStateException => return null }
    val tcount = tri.count
    if (tcount == 0) return null
    val tris = tri.tris

    @inline def ekey(a: Int, b: Int): Long =
      if (a < b) (a.toLong << 32) | b else (b.toLong << 32) | a
    @inline def elen2(k: Long): Double = {
      val a = (k >>> 32).toInt; val b = (k & 0xFFFFFFFFL).toInt
      val dx = xs(a) - xs(b); val dy = ys(a) - ys(b)
      dx * dx + dy * dy
    }
    // edge -> (tri1, tri2 or -1)
    val e1 = mutable.LongMap.empty[Int]
    val e2 = mutable.LongMap.empty[Int]
    var t = 0
    while (t < tcount) {
      var e = 0
      while (e < 3) {
        val k = ekey(tris(3 * t + e), tris(3 * t + (e + 1) % 3))
        if (e1.contains(k)) e2(k) = t else e1(k) = t
        e += 1
      }
      t += 1
    }
    // ratio threshold over the full Delaunay edge-length range
    var mn = Double.MaxValue; var mx = 0.0
    e1.foreachKey { k =>
      val l = math.sqrt(elen2(k))
      if (l < mn) mn = l; if (l > mx) mx = l
    }
    val r = math.max(0.0, math.min(1.0, ratio))
    val thr = mn + r * (mx - mn)
    // ratio=1 must carve nothing: sqrt→square round-trip can land a hair
    // below the true max squared length, which would carve the max edge
    val thr2 = if (r >= 1.0) Double.MaxValue else thr * thr

    val alive = Array.fill(tcount)(true)
    val boundary = mutable.LongMap.empty[Boolean] // current boundary edges
    val bDeg = new Array[Int](n) // boundary-edge degree per vertex
    // max-heap of (len2, edge) — lazily invalidated
    val pq = new java.util.PriorityQueue[(Double, Long)](
      64, (a: (Double, Long), b: (Double, Long)) => java.lang.Double.compare(b._1, a._1))
    @inline def addBoundary(k: Long): Unit = {
      boundary(k) = true
      bDeg((k >>> 32).toInt) += 1
      bDeg((k & 0xFFFFFFFFL).toInt) += 1
      pq.add((elen2(k), k))
    }
    e1.foreachKey { k => if (!e2.contains(k)) addBoundary(k) }

    while (!pq.isEmpty && pq.peek()._1 > thr2) {
      val (_, k) = pq.poll()
      if (boundary.contains(k)) {
        // the single alive triangle on this boundary edge
        val ta = e1(k); val tb = e2.getOrElse(k, -1)
        val tt = if (tb >= 0 && alive(tb)) { if (alive(ta)) -1 else tb }
                 else if (alive(ta)) ta else -1
        if (tt >= 0) {
          val a = (k >>> 32).toInt; val b = (k & 0xFFFFFFFFL).toInt
          var v = -1
          var i = 0
          while (i < 3) {
            val w = tris(3 * tt + i)
            if (w != a && w != b) v = w
            i += 1
          }
          // regular removal only: the exposed vertex must be interior
          if (v >= 0 && bDeg(v) == 0) {
            alive(tt) = false
            boundary.remove(k)
            bDeg(a) -= 1; bDeg(b) -= 1
            addBoundary(ekey(a, v))
            addBoundary(ekey(v, b))
          }
          // else: permanently skipped (v stays on the boundary forever)
        }
      }
    }

    // walk the simple boundary ring (every boundary vertex has degree 2)
    val adj = mutable.LongMap.empty[List[Int]] // vertex -> boundary neighbors
    var start = -1
    boundary.foreachKey { k =>
      val a = (k >>> 32).toInt; val b = (k & 0xFFFFFFFFL).toInt
      adj(a) = b :: adj.getOrElse(a.toLong, Nil)
      adj(b) = a :: adj.getOrElse(b.toLong, Nil)
      start = a
    }
    if (start < 0) return null
    val ringIdx = mutable.ArrayBuffer.empty[Int]
    var cur = start
    var prev = -1
    var guard = 0
    val nEdges = boundary.size
    while (guard <= nEdges) {
      ringIdx += cur
      val nexts = adj.getOrElse(cur.toLong, Nil).filter(_ != prev)
      if (nexts.isEmpty) return null // should not happen on a simple ring
      prev = cur
      cur = nexts.head
      if (cur == start) guard = nEdges + 1 else guard += 1
    }
    if (ringIdx.length != nEdges) return null // disconnected boundary: bail
    val ring = new Array[Double](2 * (ringIdx.length + 1))
    var i = 0
    while (i < ringIdx.length) {
      ring(2 * i) = xs(ringIdx(i)); ring(2 * i + 1) = ys(ringIdx(i))
      i += 1
    }
    ring(2 * ringIdx.length) = ring(0)
    ring(2 * ringIdx.length + 1) = ring(1)
    ring
  }
}
