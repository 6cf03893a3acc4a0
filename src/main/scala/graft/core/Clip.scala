package graft.core

/** Polygon clipping kernel behind the geometry-output layer algebra
  * (SURVEY.md §2.3; reference semantics: OGRLayer Intersection/Union/
  * SymDifference/Identity/Update/Clip/Erase, ogr/ogrsf_frmts/generic/
  * ogrlayer.cpp:5385-7900 — there implemented via GEOS overlays).
  *
  * This engine implements the overlay family for CONVEX clip geometries
  * (which covers the engine's operating surface: region boxes, tile
  * boxes, envelopes, convex hulls):
  *  - intersection(subject, convexClip): Sutherland–Hodgman against each
  *    clip edge; subject may be any polygon/multipolygon incl. holes.
  *  - difference(subject, convexClip): exact decomposition into the
  *    progressive half-plane pieces  piece_i = S ∩ H₁ ∩ … ∩ H_{i−1} ∩ H_iᶜ
  *    (the complement of a convex region is the disjoint union of those
  *    pieces), each piece produced by the same half-plane clipper.
  *  - unionAll(convex polygons): maintained as a list of DISJOINT convex
  *    pieces — each new polygon contributes (new − already-covered), so
  *    total area is exactly additive.
  * Non-convex CLIP geometries are rejected (subjects may be anything);
  * the fixtures and the tiling/zonal surface only ever clip by convex
  * shapes. Axis-aligned clip edges place intersection coordinates EXACTLY
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
        val t = ((ax - x0) * dy - (ay - y0) * dx) / denom
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
    // close + drop consecutive duplicates
    val dedup = new scala.collection.mutable.ArrayBuffer[Double](out.length + 2)
    var k = 0
    while (k < out.length) {
      val x = out(k); val y = out(k + 1)
      if (dedup.isEmpty || dedup(dedup.length - 2) != x || dedup.last != y) dedup += x += y
      k += 2
    }
    if (dedup.length >= 4 && dedup(0) == dedup(dedup.length - 2) && dedup(1) == dedup.last) {
      dedup.remove(dedup.length - 2, 2)
    }
    if (dedup.length < 6) return Array.empty
    dedup += dedup(0) += dedup(1)
    val arr = dedup.toArray
    if (GeomOps.ringArea(arr) == 0.0) Array.empty else arr
  }

  /** Ring orientation: true = counter-clockwise (signed area > 0). */
  def isCcw(ring: Array[Double]): Boolean = GeomOps.ringCross2(ring) > 0.0

  def isConvexRing(ring: Array[Double]): Boolean = {
    val n = ring.length / 2 - 1
    if (n < 3) return false
    var sign = 0
    var i = 0
    while (i < n) {
      val x0 = ring(2 * i); val y0 = ring(2 * i + 1)
      val x1 = ring(2 * ((i + 1) % n)); val y1 = ring(2 * ((i + 1) % n) + 1)
      val x2 = ring(2 * ((i + 2) % n)); val y2 = ring(2 * ((i + 2) % n) + 1)
      val c = (x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1)
      if (c != 0.0) {
        val s = if (c > 0) 1 else -1
        if (sign == 0) sign = s
        else if (s != sign) return false
      }
      i += 1
    }
    true
  }

  /** Clip edges (interior-left) of a convex ring, normalized to CCW. */
  def convexEdges(ring: Array[Double]): Array[Edge] = {
    require(isConvexRing(ring), "clip geometry must be convex")
    val ccw = if (isCcw(ring)) ring else reverseRing(ring)
    val n = ccw.length / 2 - 1
    Array.tabulate(n)(i => Edge(ccw(2 * i), ccw(2 * i + 1), ccw(2 * i + 2), ccw(2 * i + 3)))
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

  private def clipRingOfWkb(wkb: Array[Byte]): Array[Double] = {
    val g = Wkb.read(wkb)
    require(g.geomType == Wkb.PolygonType || (g.geomType == Wkb.MultiPolygonType && g.polygons.length == 1),
      "clip geometry must be a single polygon")
    require(g.polygons(0).rings.length == 1, "clip geometry must be hole-free")
    g.polygons(0).rings(0)
  }

  /** subject ∩ convexClip → Some(polygon|multipolygon WKB) or None (empty). */
  def intersection(subjectWkb: Array[Byte], clipWkb: Array[Byte]): Option[Array[Byte]] = {
    val edges = convexEdges(clipRingOfWkb(clipWkb))
    val subject = Wkb.read(subjectWkb)
    val parts = subject.polygons.flatMap(clipPolygon(_, edges))
    packParts(parts)
  }

  /** subject − convexClip → Some(multipolygon WKB of the progressive
    * half-plane pieces) or None (fully erased). */
  def difference(subjectWkb: Array[Byte], clipWkb: Array[Byte]): Option[Array[Byte]] = {
    val edges = convexEdges(clipRingOfWkb(clipWkb))
    val subject = Wkb.read(subjectWkb)
    val pieces = subject.polygons.flatMap(differencePolygon(_, edges))
    packParts(pieces)
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

  /** Union of convex hole-free polygons as a list of disjoint convex
    * pieces; exact additive area. */
  def unionAll(wkbs: Iterable[Array[Byte]]): Option[Array[Byte]] = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    wkbs.foreach { w =>
      val g = Wkb.read(w)
      g.polygons.foreach { p =>
        require(p.rings.length == 1, "union: inputs must be hole-free")
        var fresh = List(p.rings(0))
        // subtract every piece already in the union
        pieces.foreach { existing =>
          val exEdges = convexEdges(existing)
          fresh = fresh.flatMap(r =>
            differencePolygon(Wkb.Polygon(Array(r)), exEdges).map(_.rings(0)))
        }
        fresh.foreach(pieces += _)
      }
    }
    if (pieces.isEmpty) None
    else Some(Wkb.writeMultiPolygon(pieces.map(r => Array(r)).toArray))
  }

  /** Total area of a union of convex hole-free polygons (no geometry
    * materialization). */
  def unionArea(wkbs: Iterable[Array[Byte]]): Double =
    unionAll(wkbs).map(GeomOps.area).getOrElse(0.0)

  private def packParts(parts: Array[Wkb.Polygon]): Option[Array[Byte]] = {
    if (parts.isEmpty) None
    else if (parts.length == 1) Some(Wkb.writePolygon(parts(0).rings))
    else Some(Wkb.writeMultiPolygon(parts.map(_.rings)))
  }
}
