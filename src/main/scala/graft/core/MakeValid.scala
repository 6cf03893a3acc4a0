package graft.core

/** OGRGeometry::MakeValid (ogr/ogrgeometry.cpp:4183; pipeline step
  * apps/gdalalg_vector_make_valid.cpp — there delegated to GEOS
  * MakeValid). GEOS-free implementation of the LINEWORK strategy for
  * polygons: each polygon part's rings are treated as undirected
  * linework, the plane is decomposed into vertical slabs at every
  * vertex / crossing x-coordinate, and the regions with ODD vertical
  * crossing parity become the interior (the even-odd rule). Winding
  * direction and the shell/hole role are deliberately ignored — that is
  * exactly what repairs bowties, wrong-wound or escaping holes, and
  * self-overlapping rings. Parts of a MultiPolygon repair independently
  * and then merge through the overlay union (GEOS processes collections
  * per element the same way), so overlap BETWEEN parts is kept.
  *
  * Output follows the engine's disjoint-convex-piece convention: a
  * (Multi)Polygon whose parts are the kept trapezoids, the same
  * representation the union/dissolve kernels emit. Already-valid
  * geometry is returned byte-identical (reference behavior); points and
  * lines pass through with consecutive-duplicate vertex cleanup.
  *
  * Scale shape: a pure per-feature kernel (no cross-row state), so it
  * parallelizes embarrassingly under `withColumn`; slab decomposition is
  * O((n + k) · s) for n vertices, k crossings, s slabs — all per-feature
  * constants at corpus scale.
  */
object MakeValid {

  /** Repaired geometry, or None when the linework encloses no area
    * (fully degenerate input). */
  def makeValid(wkb: Array[Byte]): Option[Array[Byte]] = {
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.PointType => Some(wkb)
      case Wkb.LineStringType =>
        val c = dedupePath(g.lines(0))
        if (c.length < 4) None else Some(Wkb.writeLineString(c))
      case Wkb.MultiLineStringType =>
        val cs = g.lines.map(dedupePath).filter(_.length >= 4)
        if (cs.isEmpty) None else Some(Wkb.writeMultiLineString(cs))
      case Wkb.PolygonType | Wkb.MultiPolygonType =>
        if (isValidPolygonal(g)) Some(wkb)
        else {
          val pieceGroups = g.polygons.map(p => evenOddPieces(p.rings))
          val merged = Clip.unionPieces(pieceGroups)
          if (merged.isEmpty) None
          else if (merged.length == 1) Some(Wkb.writePolygon(Array(merged(0))))
          else Some(Wkb.writeMultiPolygon(merged.map(r => Array(r))))
        }
      case other => throw new IllegalArgumentException(s"make_valid: unsupported geometry type $other")
    }
  }

  /** st_is_valid for the polygon scope this kernel repairs: closed rings
    * with no consecutive duplicate vertices, no proper segment crossing
    * and no vertex strictly interior to another segment — within a part
    * AND between parts (OGC parts may touch only at points). */
  def isValidPolygonal(g: Wkb.Geom): Boolean =
    isValidRings(g.polygons.iterator.flatMap(_.rings).toSeq)

  /** [[isValidPolygonal]] over raw coordinate rings (the simplifyTopo
    * restore loop validates candidate rings without serializing WKB). */
  def isValidRings(ringSeq: Seq[Array[Double]]): Boolean = {
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    ringSeq.foreach { ring =>
      if (ring.length < 8) return false // < 3 distinct vertices + closure
      if (ring(0) != ring(ring.length - 2) || ring(1) != ring(ring.length - 1)) return false
      var i = 0
      while (i < ring.length - 2) {
        if (ring(i) == ring(i + 2) && ring(i + 1) == ring(i + 3)) return false
        segs += ((ring(i), ring(i + 1), ring(i + 2), ring(i + 3)))
        i += 2
      }
    }
    var i = 0
    while (i < segs.length) {
      var j = i + 1
      while (j < segs.length) {
        if (segsConflict(segs(i), segs(j))) return false
        j += 1
      }
      i += 1
    }
    true
  }

  private def cross(ox: Double, oy: Double, ax: Double, ay: Double, bx: Double, by: Double): Double =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  /** Proper crossing, or an endpoint strictly interior to the other
    * segment (T-junction / collinear overlap) — shared endpoints alone
    * are fine (ring chaining, parts touching at points). */
  private def segsConflict(s: (Double, Double, Double, Double),
                           t: (Double, Double, Double, Double)): Boolean = {
    val (ax, ay, bx, by) = s
    val (cx, cy, dx, dy) = t
    val d1 = cross(ax, ay, bx, by, cx, cy)
    val d2 = cross(ax, ay, bx, by, dx, dy)
    val d3 = cross(cx, cy, dx, dy, ax, ay)
    val d4 = cross(cx, cy, dx, dy, bx, by)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    @inline def strictlyOn(px: Double, py: Double, x0: Double, y0: Double, x1: Double, y1: Double): Boolean =
      cross(x0, y0, x1, y1, px, py) == 0.0 &&
        ((px != x0 || py != y0) && (px != x1 || py != y1)) &&
        px >= math.min(x0, x1) && px <= math.max(x0, x1) &&
        py >= math.min(y0, y1) && py <= math.max(y0, y1)
    strictlyOn(cx, cy, ax, ay, bx, by) || strictlyOn(dx, dy, ax, ay, bx, by) ||
      strictlyOn(ax, ay, cx, cy, dx, dy) || strictlyOn(bx, by, cx, cy, dx, dy)
  }

  private def dedupePath(path: Array[Double]): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < path.length) {
      if (out.length < 2 || out(out.length - 2) != path(i) || out(out.length - 1) != path(i + 1)) {
        out += path(i) += path(i + 1)
      }
      i += 2
    }
    out.toArray
  }

  /** Even-odd interior of one polygon part's ring linework as disjoint
    * convex trapezoids (vertical slab decomposition). */
  private[core] def evenOddPieces(rings: Array[Array[Double]]): Array[Array[Double]] = {
    // 1. segments (closing each ring explicitly; zero-length dropped)
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    rings.foreach { ring0 =>
      val ring = dedupePath(ring0)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val ax = ring(2 * i); val ay = ring(2 * i + 1)
        val bx = ring(2 * ((i + 1) % n)); val by = ring(2 * ((i + 1) % n) + 1)
        if (ax != bx || ay != by) segs += ((ax, ay, bx, by))
        i += 1
      }
    }
    if (segs.isEmpty) return Array.empty
    // 2. slab boundaries: every endpoint x + every proper-crossing x
    val xsB = scala.collection.mutable.ArrayBuffer.empty[Double]
    segs.foreach { case (ax, _, bx, _) => xsB += ax += bx }
    var i = 0
    while (i < segs.length) {
      val (ax, ay, bx, by) = segs(i)
      var j = i + 1
      while (j < segs.length) {
        val (cx, cy, dx, dy) = segs(j)
        val d1 = cross(ax, ay, bx, by, cx, cy)
        val d2 = cross(ax, ay, bx, by, dx, dy)
        val d3 = cross(cx, cy, dx, dy, ax, ay)
        val d4 = cross(cx, cy, dx, dy, bx, by)
        if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
            ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) {
          val t = d3 / (d3 - d4) // along s_i from (ax,ay)
          xsB += ax + t * (bx - ax)
        }
        j += 1
      }
      i += 1
    }
    val xs = xsB.distinct.sorted
    // 3. per slab: segments spanning the midpoint, ordered by y there;
    // keep the parity-odd gaps as trapezoids
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var maxAbs = 0.0
    xs.foreach(x => { val a = math.abs(x); if (a > maxAbs) maxAbs = a })
    segs.foreach { case (_, ay, _, by) =>
      val a = math.abs(ay); if (a > maxAbs) maxAbs = a
      val b = math.abs(by); if (b > maxAbs) maxAbs = b
    }
    val minArea = 1e-12 * maxAbs * maxAbs
    var s = 0
    while (s < xs.length - 1) {
      val xa = xs(s); val xb = xs(s + 1)
      if (xb > xa) {
        val xm = (xa + xb) / 2
        val spans = segs.filter { case (ax, _, bx, _) =>
          math.min(ax, bx) < xm && math.max(ax, bx) > xm
        }
        @inline def yAt(seg: (Double, Double, Double, Double), x: Double): Double = {
          val (ax, ay, bx, by) = seg
          ay + (by - ay) * ((x - ax) / (bx - ax))
        }
        val ordered = spans.sortBy(seg => yAt(seg, xm))
        var k = 0
        while (k + 1 < ordered.length) {
          val lo = ordered(k); val hi = ordered(k + 1)
          val ring = dedupePath(Array(
            xa, yAt(lo, xa), xb, yAt(lo, xb), xb, yAt(hi, xb), xa, yAt(hi, xa)))
          // re-close after dedupe (triangle slabs collapse one corner)
          val closed =
            if (ring.length >= 6 && (ring(0) != ring(ring.length - 2) || ring(1) != ring(ring.length - 1)))
              ring ++ Array(ring(0), ring(1))
            else ring
          if (closed.length >= 8 && GeomOps.ringArea(closed) > minArea) pieces += closed
          k += 2
        }
      }
      s += 1
    }
    pieces.toArray
  }
}
