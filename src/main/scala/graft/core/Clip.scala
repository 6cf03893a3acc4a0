package graft.core

/** Polygon clipping kernel behind the geometry-output layer algebra
  * (SURVEY.md §2.3; reference semantics: OGRLayer Intersection/Union/
  * SymDifference/Identity/Update/Clip/Erase, ogr/ogrsf_frmts/generic/
  * ogrlayer.cpp:5385-7900 — there implemented via GEOS overlays).
  *
  * The overlay family is built from CONVEX primitives and generalized to
  * arbitrary simple polygons by ear-clipping decomposition
  * (core.Triangulate — a clip geometry splits into disjoint convex
  * pieces, so every case below reduces to convex operations exactly):
  *  - intersection(subject, clip): Sutherland–Hodgman against each convex
  *    piece's edges; subject may be any polygon/multipolygon incl. holes.
  *  - difference(subject, clip): per piece, the exact decomposition into
  *    progressive half-plane pieces  piece_i = S ∩ H₁ ∩ … ∩ H_{i−1} ∩ H_iᶜ
  *    (the complement of a convex region is the disjoint union of those
  *    pieces), applied sequentially over the clip pieces.
  *  - unionAll(polygons): maintained as a list of DISJOINT convex
  *    pieces — each new piece contributes (new − already-covered), so
  *    total area is exactly additive.
  * Axis-aligned clip edges place intersection coordinates EXACTLY
  * (x or y copied from the clip line, no parametric rounding), so
  * box-clip results carry bit-exact coordinates into oracle comparisons.
  */
object Clip {

  /** Directed clip edge (x0,y0)→(x1,y1); interior = left side (CCW ring). */
  final case class Edge(x0: Double, y0: Double, x1: Double, y1: Double) {
    @inline def inside(px: Double, py: Double): Boolean =
      (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) >= 0.0
    def reversed: Edge = Edge(x1, y1, x0, y0)

    /** Intersection of subject segment (ax,ay)→(bx,by) with this edge's
      * carrier line; axis-aligned carriers yield exact coordinates. */
    def intersect(ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) = {
      if (x0 == x1) { // vertical line x = x0
        val t = (x0 - ax) / (bx - ax)
        (x0, ay + t * (by - ay))
      } else if (y0 == y1) { // horizontal line y = y0
        val t = (y0 - ay) / (by - ay)
        (ax + t * (bx - ax), y0)
      } else {
        // parametric t along the subject segment where it crosses the line
        val dx = x1 - x0; val dy = y1 - y0
        val denom = dx * (by - ay) - dy * (bx - ax)
        val t0 = ((ax - x0) * dy - (ay - y0) * dx) / denom
        // degenerate (near-collinear) crossing: rounding can classify a
        // collinear segment's endpoints on opposite sides with denom≈0 —
        // any point of the segment is on the line; take the midpoint
        val t = if (java.lang.Double.isFinite(t0)) math.max(0.0, math.min(1.0, t0)) else 0.5
        (ax + t * (bx - ax), ay + t * (by - ay))
      }
    }
  }

  /** Sutherland–Hodgman: clip a closed ring by one half-plane. Returns a
    * closed ring, or empty when nothing remains. */
  def clipRing(ring: Array[Double], e: Edge): Array[Double] = {
    val n = ring.length / 2 - 1 // closed: last repeats first
    if (n < 3) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Double](ring.length + 8)
    var i = 0
    while (i < n) {
      val cx = ring(2 * i); val cy = ring(2 * i + 1)
      val nx = ring(2 * i + 2); val ny = ring(2 * i + 3)
      val cIn = e.inside(cx, cy)
      val nIn = e.inside(nx, ny)
      if (cIn) {
        out += cx += cy
        if (!nIn) { val (ix, iy) = e.intersect(cx, cy, nx, ny); out += ix += iy }
      } else if (nIn) {
        val (ix, iy) = e.intersect(cx, cy, nx, ny); out += ix += iy
      }
      i += 1
    }
    if (out.length < 6) return Array.empty
    // close + drop NEAR-duplicate consecutive points: crossing points are
    // recomputed parametrically and can differ from an original vertex in
    // the last bits — exact-equality dedup would leave a micro-edge whose
    // half-plane later clips everything (observed live); tolerance is
    // relative to the coordinate magnitude
    var magn = 0.0
    var q = 0
    while (q < out.length) {
      val v = math.abs(out(q)); if (v > magn) magn = v
      q += 1
    }
    val tol2 = {
      val t = 1e-9 * math.max(magn, 1e-300)
      t * t
    }
    @inline def near(x0: Double, y0: Double, x1: Double, y1: Double): Boolean = {
      val dx = x1 - x0; val dy = y1 - y0
      dx * dx + dy * dy <= tol2
    }
    val dedup = new scala.collection.mutable.ArrayBuffer[Double](out.length + 2)
    var k = 0
    while (k < out.length) {
      val x = out(k); val y = out(k + 1)
      if (dedup.isEmpty || !near(dedup(dedup.length - 2), dedup.last, x, y)) dedup += x += y
      k += 2
    }
    while (dedup.length >= 4 && near(dedup(0), dedup(1), dedup(dedup.length - 2), dedup.last)) {
      dedup.remove(dedup.length - 2, 2)
    }
    if (dedup.length < 6) return Array.empty
    dedup += dedup(0) += dedup(1)
    val arr = dedup.toArray
    // drop rounding slivers, not just exact-zero rings: fp crossings can
    // leave pieces of area ~1e-13·coord² that explode downstream piece
    // lists (union/difference are piecewise over these)
    var maxAbs = 0.0
    var m = 0
    while (m < arr.length) {
      val a = math.abs(arr(m)); if (a > maxAbs) maxAbs = a
      m += 1
    }
    if (GeomOps.ringArea(arr) <= 1e-12 * maxAbs * maxAbs) Array.empty else arr
  }

  /** Ring orientation: true = counter-clockwise (signed area > 0). */
  def isCcw(ring: Array[Double]): Boolean = GeomOps.ringCross2(ring) > 0.0

  def isConvexRing(ring: Array[Double]): Boolean = {
    val n = ring.length / 2 - 1
    if (n < 3) return false
    // relative tolerance: clipped rings carry rounding-level cross
    // products at corners created by intersection; treat them as straight
    var maxAbs = 0.0
    var k = 0
    while (k < ring.length) {
      val a = math.abs(ring(k)); if (a > maxAbs) maxAbs = a
      k += 1
    }
    val tol = 1e-12 * maxAbs * maxAbs
    var sign = 0
    var i = 0
    while (i < n) {
      val x0 = ring(2 * i); val y0 = ring(2 * i + 1)
      val x1 = ring(2 * ((i + 1) % n)); val y1 = ring(2 * ((i + 1) % n) + 1)
      val x2 = ring(2 * ((i + 2) % n)); val y2 = ring(2 * ((i + 2) % n) + 1)
      val c = (x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1)
      if (math.abs(c) > tol) {
        val s = if (c > 0) 1 else -1
        if (sign == 0) sign = s
        else if (s != sign) return false
      }
      i += 1
    }
    true
  }

  /** Clip edges (interior-left) of a convex ring, normalized to CCW;
    * degenerate micro-edges (length ~ rounding noise relative to the
    * coordinate magnitude) are dropped — their half-plane direction is
    * numerically random and would clip arbitrarily. */
  def convexEdges(ring: Array[Double]): Array[Edge] = {
    require(isConvexRing(ring), "clip geometry must be convex")
    val ccw = if (isCcw(ring)) ring else reverseRing(ring)
    val n = ccw.length / 2 - 1
    var magn = 0.0
    var i = 0
    while (i < ccw.length) {
      val v = math.abs(ccw(i)); if (v > magn) magn = v
      i += 1
    }
    val tol2 = { val t = 1e-9 * math.max(magn, 1e-300); t * t }
    Array.tabulate(n)(i => Edge(ccw(2 * i), ccw(2 * i + 1), ccw(2 * i + 2), ccw(2 * i + 3)))
      .filter { e =>
        val dx = e.x1 - e.x0; val dy = e.y1 - e.y0
        dx * dx + dy * dy > tol2
      }
  }

  def reverseRing(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    val out = new Array[Double](ring.length)
    var i = 0
    while (i < n) {
      out(2 * i) = ring(2 * (n - 1 - i))
      out(2 * i + 1) = ring(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** Polygon (outer + holes) clipped to a convex region. */
  def clipPolygon(poly: Wkb.Polygon, edges: Array[Edge]): Option[Wkb.Polygon] = {
    var outer = poly.rings(0)
    var e = 0
    while (e < edges.length && outer.nonEmpty) { outer = clipRing(outer, edges(e)); e += 1 }
    if (outer.isEmpty) return None
    val holes = poly.rings.drop(1).flatMap { h0 =>
      var h = h0
      var k = 0
      while (k < edges.length && h.nonEmpty) { h = clipRing(h, edges(k)); k += 1 }
      if (h.isEmpty) None else Some(h)
    }
    Some(Wkb.Polygon(Array(outer) ++ holes))
  }

  /** Clip geometry → disjoint convex rings: a single convex hole-free
    * polygon passes through; anything else (concave, holes, multi-part)
    * decomposes via ear-clipping triangulation (Triangulate.convexPieces),
    * making every overlay below fully general for simple polygons. */
  private def clipPiecesOfWkb(wkb: Array[Byte]): Array[Array[Double]] =
    Triangulate.convexPieces(wkb)

  @inline private def isLineType(wkb: Array[Byte]): Boolean = {
    val t = Wkb.geomType(wkb)
    t == Wkb.LineStringType || t == Wkb.MultiLineStringType
  }

  @inline private def isPointType(wkb: Array[Byte]): Boolean = {
    val t = Wkb.geomType(wkb)
    t == Wkb.PointType || t == Wkb.MultiPointType
  }

  private def packPoints(coords: Array[Double]): Option[Array[Byte]] = {
    if (coords.isEmpty) None
    else if (coords.length == 2) Some(Wkb.writePoint(coords(0), coords(1)))
    else Some(Wkb.writeMultiPoint(coords))
  }

  /** (Multi)Point ∩ polygon / − polygon: keep the members that fall
    * inside / outside the clip (even-odd PIP, holes honored) — the
    * point-layer row of the reference's type-generic layer algebra
    * (ogrlayer.cpp:4004-4072 filter-refine over arbitrary geometry). */
  private def selectPoints(subjectWkb: Array[Byte], clipWkb: Array[Byte],
                           keepInside: Boolean): Option[Array[Byte]] = {
    val pts = Wkb.read(subjectWkb).points
    // parse the clip ONCE; per-member tests walk the parsed rings
    val clip = Wkb.read(clipWkb).polygons
    @inline def inside(px: Double, py: Double): Boolean = {
      var parity = false
      var p = 0
      while (p < clip.length) {
        if (Pip.inPolygon(clip(p), px, py)) parity = !parity
        p += 1
      }
      parity
    }
    val kept = Array.newBuilder[Double]
    var i = 0
    while (i < pts.length) {
      if (inside(pts(i), pts(i + 1)) == keepInside) {
        kept += pts(i); kept += pts(i + 1)
      }
      i += 2
    }
    packPoints(kept.result())
  }

  /** Inside parameter interval [t0,t1] of segment (ax,ay)→(bx,by) against
    * the convex region bounded by `edges` — Liang–Barsky/Cyrus–Beck
    * parametric clipping (the reference's line support in layer algebra,
    * ogrlayer.cpp:5385 Intersection over line layers — there via GEOS).
    * Returns null when the segment misses the region. */
  def segInsideInterval(ax: Double, ay: Double, bx: Double, by: Double,
                        edges: Array[Edge]): Array[Double] = {
    var t0 = 0.0
    var t1 = 1.0
    var i = 0
    while (i < edges.length) {
      val e = edges(i)
      // inward normal of the CCW edge = (-dy, dx); inside: n·(P−e0) ≥ 0
      val nx = -(e.y1 - e.y0)
      val ny = e.x1 - e.x0
      val denom = nx * (bx - ax) + ny * (by - ay)
      val num = nx * (ax - e.x0) + ny * (ay - e.y0)
      if (denom == 0.0) {
        if (num < 0.0) return null // parallel and fully outside this edge
      } else {
        val t = -num / denom
        if (denom > 0.0) { if (t > t0) t0 = t } // entering
        else { if (t < t1) t1 = t } // leaving
      }
      if (t0 > t1) return null
      i += 1
    }
    Array(t0, t1)
  }

  @inline private def subSeg(ax: Double, ay: Double, bx: Double, by: Double,
                             t0: Double, t1: Double): Array[Double] =
    Array(ax + t0 * (bx - ax), ay + t0 * (by - ay),
      ax + t1 * (bx - ax), ay + t1 * (by - ay))

  private def packLines(segs: Array[Array[Double]]): Option[Array[Byte]] = {
    if (segs.isEmpty) None
    else if (segs.length == 1) Some(Wkb.writeLineString(segs(0)))
    else Some(Wkb.writeMultiLineString(segs))
  }

  /** (Multi)LineString ∩ polygon: each segment's inside interval per
    * disjoint convex clip piece; total clipped length is exactly additive
    * (pieces are disjoint). Output may be fragmented at piece boundaries —
    * length/coverage exact, vertex layout not canonical. */
  def intersectionLine(subjectWkb: Array[Byte], clipWkb: Array[Byte]): Option[Array[Byte]] = {
    val g = Wkb.read(subjectWkb)
    val pieceEdges = clipPiecesOfWkb(clipWkb).map(convexEdges)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    g.lines.foreach { path =>
      var i = 0
      while (i < path.length - 2) {
        val ax = path(i); val ay = path(i + 1)
        val bx = path(i + 2); val by = path(i + 3)
        pieceEdges.foreach { edges =>
          val t = segInsideInterval(ax, ay, bx, by, edges)
          if (t != null && t(1) - t(0) > 1e-12)
            out += subSeg(ax, ay, bx, by, t(0), t(1))
        }
        i += 2
      }
    }
    packLines(out.toArray)
  }

  /** (Multi)LineString − polygon: sequential subtraction of the clip's
    * convex pieces from the segment set (the complement intervals of each
    * piece's inside interval). */
  def differenceLine(subjectWkb: Array[Byte], clipWkb: Array[Byte]): Option[Array[Byte]] = {
    val g = Wkb.read(subjectWkb)
    val pieceEdges = clipPiecesOfWkb(clipWkb).map(convexEdges)
    var segs = List.empty[Array[Double]]
    g.lines.foreach { path =>
      var i = 0
      while (i < path.length - 2) {
        segs ::= Array(path(i), path(i + 1), path(i + 2), path(i + 3))
        i += 2
      }
    }
    pieceEdges.foreach { edges =>
      segs = segs.flatMap { s =>
        val t = segInsideInterval(s(0), s(1), s(2), s(3), edges)
        if (t == null) List(s)
        else {
          var parts = List.empty[Array[Double]]
          if (t(0) > 1e-12) parts ::= subSeg(s(0), s(1), s(2), s(3), 0.0, t(0))
          if (t(1) < 1.0 - 1e-12) parts ::= subSeg(s(0), s(1), s(2), s(3), t(1), 1.0)
          parts
        }
      }
    }
    packLines(segs.reverse.toArray)
  }

  /** subject ∩ clip → Some(polygon|multipolygon WKB) or None (empty).
    * Clip may be any simple polygon/multipolygon (incl. holes): its
    * disjoint convex pieces each clip the subject, and the piece results
    * concatenate exactly. LineString subjects route to the Liang–Barsky
    * line kernel (geometry-type-generic layer algebra,
    * ogrlayer.cpp:5385). */
  def intersection(subjectWkb: Array[Byte], clipWkb: Array[Byte]): Option[Array[Byte]] = {
    if (isPointType(subjectWkb)) return selectPoints(subjectWkb, clipWkb, keepInside = true)
    if (isLineType(subjectWkb)) return intersectionLine(subjectWkb, clipWkb)
    val subject = Wkb.read(subjectWkb)
    val parts = clipPiecesOfWkb(clipWkb).flatMap { piece =>
      val edges = convexEdges(piece)
      subject.polygons.flatMap(clipPolygon(_, edges))
    }
    packParts(parts)
  }

  /** subject − clip → Some(multipolygon WKB) or None (fully erased);
    * clip generality as in intersection (sequential subtraction of its
    * convex pieces). */
  def difference(subjectWkb: Array[Byte], clipWkb: Array[Byte]): Option[Array[Byte]] = {
    if (isPointType(subjectWkb)) return selectPoints(subjectWkb, clipWkb, keepInside = false)
    if (isLineType(subjectWkb)) return differenceLine(subjectWkb, clipWkb)
    val subject = Wkb.read(subjectWkb)
    var cur = subject.polygons
    val pieces = clipPiecesOfWkb(clipWkb)
    var i = 0
    while (i < pieces.length && cur.nonEmpty) {
      val edges = convexEdges(pieces(i))
      cur = cur.flatMap(differencePolygon(_, edges))
      i += 1
    }
    packParts(cur)
  }

  /** One polygon minus the convex region bounded by `edges`. */
  def differencePolygon(poly: Wkb.Polygon, edges: Array[Edge]): Array[Wkb.Polygon] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Wkb.Polygon]
    var remaining: Option[Wkb.Polygon] = Some(poly)
    var i = 0
    while (i < edges.length && remaining.nonEmpty) {
      // piece outside this edge (and inside all previous ones)
      clipPolygon(remaining.get, Array(edges(i).reversed)).foreach(out += _)
      remaining = clipPolygon(remaining.get, Array(edges(i)))
      i += 1
    }
    out.toArray
  }

  @inline private def ringEnv(ring: Array[Double]): (Double, Double, Double, Double) = {
    var mnx = Double.MaxValue; var mny = Double.MaxValue
    var mxx = -Double.MaxValue; var mxy = -Double.MaxValue
    var i = 0
    while (i < ring.length) {
      val x = ring(i); val y = ring(i + 1)
      if (x < mnx) mnx = x; if (x > mxx) mxx = x
      if (y < mny) mny = y; if (y > mxy) mxy = y
      i += 2
    }
    (mnx, mny, mxx, mxy)
  }

  /** Merge two internally-disjoint convex-piece sets into one disjoint
    * set: left pieces are kept verbatim; each right piece subtracts ONLY
    * the left pieces whose envelope intersects its own — found via a
    * bulk-loaded STR tree (linear scan below a small cutoff). Most piece
    * pairs in a large dissolve group are spatially disjoint, so the
    * envelope fast path turns the former all-pairs subtraction into work
    * proportional to true overlaps. */
  def mergeDisjointPieces(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val aEnvs = a.map(ringEnv)
    val tree = if (a.length > 8) StrTree.build(aEnvs) else null
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    out ++= a
    b.foreach { ring =>
      val (mnx, mny, mxx, mxy) = ringEnv(ring)
      val hits =
        if (tree != null) tree.query(mnx, mny, mxx, mxy)
        else Array.range(0, a.length).filter { i =>
          val e = aEnvs(i)
          Pip.bboxIntersects(e._1, e._2, e._3, e._4, mnx, mny, mxx, mxy)
        }
      var fresh = List(ring)
      var h = 0
      while (h < hits.length && fresh.nonEmpty) {
        val exEdges = convexEdges(a(hits(h)))
        fresh = fresh.flatMap(r =>
          differencePolygon(Wkb.Polygon(Array(r)), exEdges).map(_.rings(0)))
        h += 1
      }
      fresh.foreach(out += _)
    }
    out.toArray
  }

  /** Cascaded union of piece GROUPS (each group internally disjoint —
    * e.g. one geometry's convex decomposition): pairwise tree merge, the
    * UnionCascaded shape of the reference (ogr/ogrgeometry.cpp:5553
    * OGRGeometryFactory::organizePolygons→UnionCascaded path — behavior
    * only). log k levels of mergeDisjointPieces instead of subtracting
    * every new piece against the whole accumulated list (O(k²)). */
  def unionPieces(groups: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    if (groups.isEmpty) return Array.empty
    var level = groups
    while (level.length > 1) {
      val next = new Array[Array[Array[Double]]]((level.length + 1) / 2)
      var i = 0
      while (2 * i < level.length) {
        next(i) =
          if (2 * i + 1 < level.length) mergeDisjointPieces(level(2 * i), level(2 * i + 1))
          else level(2 * i)
        i += 1
      }
      level = next
    }
    level(0)
  }

  /** Union of arbitrary simple polygons (decomposed to convex pieces) as
    * a list of disjoint convex pieces; exact additive area. */
  def unionAll(wkbs: Iterable[Array[Byte]]): Option[Array[Byte]] = {
    val groups = wkbs.iterator.map(Triangulate.convexPieces).filter(_.nonEmpty).toArray
    val pieces = unionPieces(groups)
    if (pieces.isEmpty) None
    else Some(Wkb.writeMultiPolygon(pieces.map(r => Array(r))))
  }

  /** Total area of a union of simple polygons (no geometry
    * materialization). */
  def unionArea(wkbs: Iterable[Array[Byte]]): Double =
    unionAll(wkbs).map(GeomOps.area).getOrElse(0.0)

  private def packParts(parts: Array[Wkb.Polygon]): Option[Array[Byte]] = {
    if (parts.isEmpty) None
    else if (parts.length == 1) Some(Wkb.writePolygon(parts(0).rings))
    else Some(Wkb.writeMultiPolygon(parts.map(_.rings)))
  }
}
