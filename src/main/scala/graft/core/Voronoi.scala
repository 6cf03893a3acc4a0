package graft.core

/** Bounded Voronoi diagram construction — the dual of the Delaunay core
  * (core/Delaunay.scala), clipped to a bounding box.
  *
  * Each site's cell is the intersection of the box with the bisector
  * half-planes toward its DELAUNAY NEIGHBORS only: the unbounded Voronoi
  * cell's supporting half-planes are exactly the neighbor bisectors (every
  * Voronoi edge is dual to a Delaunay edge), and intersecting with the box
  * afterwards only shrinks the cell — so non-neighbor bisectors can never
  * cut into the result. This keeps the per-site work O(deg) instead of
  * O(n), the property that makes the per-tile distributed path viable
  * (ghost margins bound the neighbor set exactly as in Grid's tiled
  * Delaunay, ops/Grid.scala).
  *
  * Degenerate inputs (n < 3, collinear sites — the triangulation then has
  * no interior faces) fall back to all-pairs bisector clipping, which is
  * always correct, just O(n) per site.
  *
  * The reference exposes Voronoi indirectly through its Delaunay
  * triangulation surface (alg/delaunay.c); cells here follow the textbook
  * dual construction, not any reference code.
  */
object Voronoi {

  /** One closed CCW ring per site: the site's Voronoi cell ∩ box.
    * Sites must be pairwise distinct (duplicate sites make the diagram
    * undefined — dedupe upstream, keeping a canonical id).
    *
    * Two phases. (1) Clip the box by the 1-ring (Delaunay-neighbor)
    * bisectors — exact when the triangulation is exactly Delaunay.
    * (2) VERTEX REFINEMENT, which keeps the result correct even when the
    * float-verdict incremental triangulation leaves an illegal edge:
    * every intermediate region R ⊇ V(i)∩box (only true bisectors are ever
    * applied), and d²(p,i) − d²(p,j) is affine in p, so its max over
    * convex R sits at a vertex — hence R = V(i)∩box iff every VERTEX of R
    * is nearest to site i. Any vertex strictly nearer to some j triggers
    * one more clip by that bisector; each clip strictly shrinks R, so the
    * loop reaches the fixed point (true Voronoi vertices are equidistant
    * ties, excluded by the relative epsilon). */
  def cellRings(xs: Array[Double], ys: Array[Double],
                minx: Double, miny: Double, maxx: Double, maxy: Double): Array[Array[Double]] = {
    val n = xs.length
    require(n >= 1, "need at least one site")
    val neighbors = Array.fill(n)(scala.collection.mutable.HashSet.empty[Int])
    if (n >= 3) {
      val tri = Delaunay.triangulate(xs, ys)
      var t = 0
      while (t < tri.tris.length) {
        val a = tri.tris(t); val b = tri.tris(t + 1); val c = tri.tris(t + 2)
        neighbors(a) += b; neighbors(a) += c
        neighbors(b) += a; neighbors(b) += c
        neighbors(c) += a; neighbors(c) += b
        t += 3
      }
    }
    val box = Array(minx, miny, maxx, miny, maxx, maxy, minx, maxy, minx, miny)
    Array.tabulate(n) { i =>
      val nbrs =
        if (neighbors(i).nonEmpty) neighbors(i).toArray
        else Array.tabulate(n)(identity).filter(_ != i) // degenerate fallback
      var ring = box
      var k = 0
      while (k < nbrs.length && ring.nonEmpty) {
        ring = Clip.clipRing(ring, bisectorEdge(xs(i), ys(i), xs(nbrs(k)), ys(nbrs(k))))
        k += 1
      }
      // vertex refinement (see scaladoc): brute nearest-site per vertex is
      // O(n) — fine for the guarded driver path; the per-tile distributed
      // path bounds the candidate set by the ghost margin instead
      var changed = true
      var rounds = 0
      while (changed && ring.nonEmpty && rounds < 64) {
        changed = false
        var v = 0
        while (v + 3 < ring.length && !changed) {
          val vx = ring(v); val vy = ring(v + 1)
          val di = (vx - xs(i)) * (vx - xs(i)) + (vy - ys(i)) * (vy - ys(i))
          val eps = 1e-9 * (di + 1e-12)
          var j = 0
          while (j < n && !changed) {
            if (j != i) {
              val dj = (vx - xs(j)) * (vx - xs(j)) + (vy - ys(j)) * (vy - ys(j))
              if (dj < di - eps) {
                ring = Clip.clipRing(ring, bisectorEdge(xs(i), ys(i), xs(j), ys(j)))
                changed = true
              }
            }
            j += 1
          }
          v += 2
        }
        rounds += 1
      }
      ring
    }
  }

  /** Cells as polygon WKBs (empty cells — a site outside the box — yield
    * a degenerate empty-ring polygon; callers with in-box sites never see
    * one). */
  def cells(xs: Array[Double], ys: Array[Double],
            minx: Double, miny: Double, maxx: Double, maxy: Double): Array[Array[Byte]] =
    cellRings(xs, ys, minx, miny, maxx, maxy).map(r => Wkb.writePolygon(Array(r)))

  /** Directed clip edge whose LEFT side (Clip.Edge.inside ≥ 0) is the
    * half-plane of points closer to site i than to site j: through the
    * midpoint, perpendicular to i→j, oriented so i tests inside. */
  private[core] def bisectorEdge(xi: Double, yi: Double,
                                 xj: Double, yj: Double): Clip.Edge = {
    val mx = (xi + xj) / 2.0; val my = (yi + yj) / 2.0
    val dx = xj - xi; val dy = yj - yi
    Clip.Edge(mx, my, mx - dy, my + dx)
  }
}
