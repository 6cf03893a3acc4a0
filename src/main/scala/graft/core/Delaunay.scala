package graft.core

/** Bowyer–Watson Delaunay triangulation + barycentric plane interpolation
  * (SURVEY.md §2.4 grid metrics; reference semantics: GGA_Linear,
  * alg/gdal_alg.h:402-416, over alg/delaunay.c — a re-implementation of
  * the published incremental-insertion algorithm, not a translation).
  *
  * Insertion order is Hilbert-sorted so the locate step (a remembering
  * stochastic walk through triangle adjacency) touches O(1) triangles per
  * insert in practice; the bad-triangle cavity is grown by BFS over
  * adjacency, so each insertion costs O(cavity), giving ~O(n) total on
  * shuffled/sorted realistic inputs (vs O(n²) for the naive full scan).
  */
object Delaunay {

  /** Triangulation result: flat vertex-index triples (t*3 + {0,1,2}) into
    * the caller's point arrays. Super-triangle faces are already removed. */
  final case class Tri(tris: Array[Int]) {
    def count: Int = tris.length / 3
  }

  /** Triangulate (xs(i), ys(i)) points. Duplicate points are skipped. */
  def triangulate(xs: Array[Double], ys: Array[Double]): Tri = {
    val n = xs.length
    require(n >= 3, "need >= 3 points")

    // bounding super-triangle (vertices appended after the real points)
    var minx = Double.MaxValue; var miny = Double.MaxValue
    var maxx = -Double.MaxValue; var maxy = -Double.MaxValue
    var i = 0
    while (i < n) {
      if (xs(i) < minx) minx = xs(i); if (xs(i) > maxx) maxx = xs(i)
      if (ys(i) < miny) miny = ys(i); if (ys(i) > maxy) maxy = ys(i)
      i += 1
    }
    val dmax = math.max(maxx - minx, maxy - miny) * 16 + 1.0
    val cx = (minx + maxx) / 2; val cy = (miny + maxy) / 2
    val px = new Array[Double](n + 3)
    val py = new Array[Double](n + 3)
    System.arraycopy(xs, 0, px, 0, n)
    System.arraycopy(ys, 0, py, 0, n)
    px(n) = cx - 2 * dmax; py(n) = cy - dmax
    px(n + 1) = cx + 2 * dmax; py(n + 1) = cy - dmax
    px(n + 2) = cx; py(n + 2) = cy + 2 * dmax

    // triangle soup with adjacency: verts(3t..3t+2), adj(3t+e) = neighbor
    // triangle across edge e = (v(e), v(e+1 mod 3)), or -1
    val verts = new scala.collection.mutable.ArrayBuffer[Int](n * 8)
    val adj = new scala.collection.mutable.ArrayBuffer[Int](n * 8)
    val alive = new scala.collection.mutable.ArrayBuffer[Boolean](n * 3)
    def newTri(a: Int, b: Int, c: Int): Int = {
      val t = verts.length / 3
      verts += a += b += c
      adj += -1 += -1 += -1
      alive += true
      t
    }
    @inline def cross(ax: Double, ay: Double, bx: Double, by: Double,
                      qx: Double, qy: Double): Double =
      (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)

    /** q strictly inside the circumcircle of triangle t — with GHOST
      * semantics for triangles touching super vertices: as the super
      * vertices go to infinity, the circumcircle of a 1-super triangle
      * tends to the open half-plane beyond its real (hull) edge, and a
      * 2-super corner triangle to the half-plane beyond its real vertex
      * along the bisector of the two super directions. No finite super
      * triangle is safe here: a near-collinear hull triple has a
      * circumradius unbounded in the data extent, so the finite test
      * leaves concave notches on the hull. */
    @inline def inCircumcircle(t: Int, qx: Double, qy: Double): Boolean = {
      val a = verts(3 * t); val b = verts(3 * t + 1); val c = verts(3 * t + 2)
      val ns = (if (a >= n) 1 else 0) + (if (b >= n) 1 else 0) + (if (c >= n) 1 else 0)
      if (ns == 0) {
        val ax = px(a) - qx; val ay = py(a) - qy
        val bx = px(b) - qx; val by = py(b) - qy
        val ccx = px(c) - qx; val ccy = py(c) - qy
        val det = (ax * ax + ay * ay) * (bx * ccy - ccx * by) -
          (bx * bx + by * by) * (ax * ccy - ccx * ay) +
          (ccx * ccx + ccy * ccy) * (ax * by - bx * ay)
        det > 0.0
      } else if (ns == 3) true
      else if (ns == 1) {
        // real directed edge (ra, rb) keeps the triangle's CCW order, so
        // the super vertex (and the hull exterior) is strictly left of it
        val (ra, rb) =
          if (a >= n) (b, c) else if (b >= n) (c, a) else (a, b)
        val cr = cross(px(ra), py(ra), px(rb), py(rb), qx, qy)
        if (cr > 0.0) true
        else if (cr == 0.0) {
          // on the hull-edge line: inside the ghost circle iff strictly
          // interior to the segment (endpoint match = duplicate → skip)
          qx >= math.min(px(ra), px(rb)) && qx <= math.max(px(ra), px(rb)) &&
            qy >= math.min(py(ra), py(rb)) && qy <= math.max(py(ra), py(rb)) &&
            !(qx == px(ra) && qy == py(ra)) && !(qx == px(rb) && qy == py(rb))
        } else false
      } else {
        // ns == 2: half-plane beyond the real vertex r along the bisector
        // of the directions to the two super vertices
        val r = if (a < n) a else if (b < n) b else c
        val s1 = if (a >= n) a else b
        val s2 = if (c >= n) c else b
        val d1x = px(s1) - px(r); val d1y = py(s1) - py(r)
        val d2x = px(s2) - px(r); val d2y = py(s2) - py(r)
        val n1 = math.sqrt(d1x * d1x + d1y * d1y)
        val n2 = math.sqrt(d2x * d2x + d2y * d2y)
        val mx = d1x / n1 + d2x / n2
        val my = d1y / n1 + d2y / n2
        (qx - px(r)) * mx + (qy - py(r)) * my > 0.0
      }
    }

    val root = newTri(n, n + 1, n + 2)

    /** Walk from `start` to a triangle containing q. */
    def locate(start: Int, qx: Double, qy: Double): Int = {
      var t = start
      var guard = 0
      val limit = 4 * (verts.length / 3) + 16
      while (guard < limit) {
        var moved = false
        var e = 0
        while (e < 3 && !moved) {
          val a = verts(3 * t + e)
          val b = verts(3 * t + (e + 1) % 3)
          if (cross(px(a), py(a), px(b), py(b), qx, qy) < 0) {
            val nt = adj(3 * t + e)
            if (nt >= 0) { t = nt; moved = true }
          }
          e += 1
        }
        if (!moved) return t
        guard += 1
      }
      // fallback: linear scan (degenerate walk loop)
      var s = 0
      while (s < verts.length / 3) {
        if (alive(s)) {
          val a = verts(3 * s); val b = verts(3 * s + 1); val c = verts(3 * s + 2)
          if (cross(px(a), py(a), px(b), py(b), qx, qy) >= 0 &&
            cross(px(b), py(b), px(c), py(c), qx, qy) >= 0 &&
            cross(px(c), py(c), px(a), py(a), qx, qy) >= 0) return s
        }
        s += 1
      }
      t
    }

    // Hilbert-order insertion for short walks
    val order = Array.range(0, n)
    val w = math.max(maxx - minx, 1e-12); val h = math.max(maxy - miny, 1e-12)
    val hOrder = 14
    val keys = new Array[Long](n)
    i = 0
    while (i < n) {
      val gx = math.min((1 << hOrder) - 1, ((xs(i) - minx) / w * (1 << hOrder)).toInt)
      val gy = math.min((1 << hOrder) - 1, ((ys(i) - miny) / h * (1 << hOrder)).toInt)
      keys(i) = Hilbert.xy2d(hOrder, gx, gy)
      i += 1
    }
    val sorted = order.sortBy(keys)

    var last = root
    val badStack = new scala.collection.mutable.ArrayDeque[Int]()
    val bad = new scala.collection.mutable.ArrayBuffer[Int]()
    val isBad = new scala.collection.mutable.HashSet[Int]()
    // boundary edges of the cavity: (vertA, vertB, outerNeighbor)
    val boundA = new scala.collection.mutable.ArrayBuffer[Int]()
    val boundB = new scala.collection.mutable.ArrayBuffer[Int]()
    val boundN = new scala.collection.mutable.ArrayBuffer[Int]()

    var oi = 0
    while (oi < n) {
      val p = sorted(oi)
      val qx = xs(p); val qy = ys(p)
      var seed = locate(last, qx, qy)
      var proceed = inCircumcircle(seed, qx, qy)
      if (!proceed) {
        // duplicate vertex (on every incident circumcircle ⇒ det = 0) or
        // numerical edge case: try the neighbors before skipping
        var e = 0
        while (e < 3 && !proceed) {
          val nt = adj(3 * seed + e)
          if (nt >= 0 && inCircumcircle(nt, qx, qy)) { seed = nt; proceed = true }
          e += 1
        }
      }
      if (!proceed) last = seed // exact duplicate: skip this point
      if (proceed) {
        bad.clear(); isBad.clear(); badStack.clear()
        boundA.clear(); boundB.clear(); boundN.clear()
        badStack.append(seed); isBad.add(seed)
        while (badStack.nonEmpty) {
          val t = badStack.removeLast()
          bad += t
          var e = 0
          while (e < 3) {
            val nt = adj(3 * t + e)
            if (nt >= 0 && !isBad.contains(nt) && inCircumcircle(nt, qx, qy)) {
              isBad.add(nt); badStack.append(nt)
            } else if (nt < 0 || !isBad.contains(nt)) {
              boundA += verts(3 * t + e)
              boundB += verts(3 * t + (e + 1) % 3)
              boundN += nt
            }
            e += 1
          }
        }
        // NOTE: boundary collection above may include edges whose neighbor
        // becomes bad LATER in the BFS — re-filter now that isBad is final
        val m0 = boundA.length
        val fA = new scala.collection.mutable.ArrayBuffer[Int](m0)
        val fB = new scala.collection.mutable.ArrayBuffer[Int](m0)
        val fN = new scala.collection.mutable.ArrayBuffer[Int](m0)
        var k = 0
        while (k < m0) {
          if (boundN(k) < 0 || !isBad.contains(boundN(k))) {
            fA += boundA(k); fB += boundB(k); fN += boundN(k)
          }
          k += 1
        }
        bad.foreach(t => alive(t) = false)
        // fan: one new triangle per boundary edge; link adjacents
        val newTris = new Array[Int](fA.length)
        k = 0
        while (k < fA.length) {
          val t = newTri(fA(k), fB(k), p)
          newTris(k) = t
          val outer = fN(k)
          adj(3 * t) = outer
          if (outer >= 0) {
            var e = 0
            while (e < 3) {
              if (verts(3 * outer + e) == fB(k) && verts(3 * outer + (e + 1) % 3) == fA(k))
                adj(3 * outer + e) = t
              e += 1
            }
          }
          k += 1
        }
        // link fan siblings by shared (vertex, p) edges. Each cavity-
        // boundary vertex must start (and end) EXACTLY one boundary edge —
        // a simple cavity. Inconsistent float circumcircle verdicts could
        // in principle produce a boundary touching a vertex twice; a map
        // overwrite would then silently corrupt adjacency, so fail fast
        // instead (callers treat it as degenerate input).
        val byA = new scala.collection.mutable.HashMap[Int, Int]() // boundary start vert -> tri
        k = 0
        while (k < fA.length) {
          if (byA.put(fA(k), newTris(k)).isDefined)
            throw new IllegalStateException(
              s"non-simple insertion cavity at vertex ${fA(k)}: degenerate/near-collinear input")
          k += 1
        }
        k = 0
        while (k < fA.length) {
          val t = newTris(k)
          // edge 1 = (fB, p): neighbor is the fan triangle starting at fB
          byA.get(fB(k)).foreach(nt => adj(3 * t + 1) = nt)
          // edge 2 = (p, fA): neighbor is the fan triangle ENDING at fA
          k += 1
        }
        // second pass for edge 2 links (triangle whose fB == this fA)
        val byB = new scala.collection.mutable.HashMap[Int, Int]()
        k = 0
        while (k < fA.length) {
          if (byB.put(fB(k), newTris(k)).isDefined)
            throw new IllegalStateException(
              s"non-simple insertion cavity at vertex ${fB(k)}: degenerate/near-collinear input")
          k += 1
        }
        k = 0
        while (k < fA.length) {
          byB.get(fA(k)).foreach(nt => adj(3 * newTris(k) + 2) = nt)
          k += 1
        }
        last = newTris(0)
      }
      oi += 1
    }

    // emit live triangles not touching the super vertices
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var t = 0
    val total = verts.length / 3
    while (t < total) {
      if (alive(t)) {
        val a = verts(3 * t); val b = verts(3 * t + 1); val c = verts(3 * t + 2)
        if (a < n && b < n && c < n) { out += a += b += c }
      }
      t += 1
    }
    Tri(out.toArray)
  }

  /** Circumcircle (centerX, centerY, radius²) of a triangle — the
    * LOCALITY CERTIFICATE for per-tile triangulation: a locally-Delaunay
    * triangle is also globally Delaunay whenever its circumcircle lies
    * inside the region whose points the local set fully contains (its
    * emptiness then holds against every point). Collinear triangles
    * return an infinite radius (never certifiable). */
  def circumcircle(ax: Double, ay: Double, bx: Double, by: Double,
                   cx: Double, cy: Double): (Double, Double, Double) = {
    val d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if (d == 0.0) return (0.0, 0.0, Double.PositiveInfinity)
    val a2 = ax * ax + ay * ay
    val b2 = bx * bx + by * by
    val c2 = cx * cx + cy * cy
    val ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    val uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    (ux, uy, (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy))
  }

  /** Barycentric weights of q in triangle (a, b, c); null if outside
    * (tolerance `eps` relative to the triangle area, so nodes on shared
    * edges land in one of the incident triangles). */
  def barycentric(ax: Double, ay: Double, bx: Double, by: Double,
                  cx: Double, cy: Double, qx: Double, qy: Double,
                  eps: Double = 1e-9): Array[Double] = {
    val det = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    if (det == 0.0) return null
    val wa = ((bx - qx) * (cy - qy) - (cx - qx) * (by - qy)) / det
    val wb = ((cx - qx) * (ay - qy) - (ax - qx) * (cy - qy)) / det
    val wc = 1.0 - wa - wb
    val tol = -eps
    if (wa >= tol && wb >= tol && wc >= tol) Array(wa, wb, wc) else null
  }
}
