package graft.core

/** Geometry buffering (SURVEY.md §2.8 geometry ETL; reference semantics:
  * OGRGeometry::Buffer, ogr/ogrgeometry.cpp:4949, and the pipeline step
  * apps/gdalalg_vector_buffer.cpp — there delegated to GEOS; implemented
  * here from the Minkowski-sum definition over the engine's convex-piece
  * machinery).
  *
  * Positive distance: buffer(G, r) = G ⊕ disc(r). Minkowski sum
  * distributes over union, so the convex decomposition gives
  * ∪ᵢ (pieceᵢ ⊕ disc) — each convex piece buffers exactly (edges offset
  * along outward normals, vertices joined by round arcs approximated with
  * `quadsegs` segments per quarter circle, the nQuadSegs convention), and
  * the piece buffers merge through the cascaded union. Points buffer to
  * 4·quadsegs-gon discs; lines to unions of per-segment capsules.
  *
  * Negative distance (polygon erosion): G ⊖ disc(r) = G − (∂G ⊕ disc(r))
  * — the boundary rings buffer as closed polylines (capsules) and
  * subtract via the overlay difference kernel, so holes grow and thin
  * necks collapse exactly as the definition requires (up to the N-gon
  * arc approximation).
  */
object Buffer {

  /** Buffered geometry as (multi)polygon WKB; None when the result is
    * empty (fully eroded polygon / negative r on a point or line). */
  def buffer(wkb: Array[Byte], r: Double, quadsegs: Int = 8): Option[Array[Byte]] = {
    require(quadsegs >= 1, "quadsegs >= 1")
    if (r == 0.0) return Some(wkb)
    val g = Wkb.read(wkb)
    if (r < 0.0) {
      if (g.geomType != Wkb.PolygonType && g.geomType != Wkb.MultiPolygonType)
        return None // negative buffer of point/line is empty
      return erode(wkb, g, -r, quadsegs)
    }
    g.geomType match {
      case Wkb.PointType =>
        Some(Wkb.writePolygon(Array(discRing(g.points(0), g.points(1), r, quadsegs))))
      case Wkb.LineStringType | Wkb.MultiLineStringType =>
        Clip.unionAll(pathCapsules(g.lines, r, quadsegs))
      case Wkb.PolygonType | Wkb.MultiPolygonType =>
        val pieces = Triangulate.convexPieces(wkb)
        Clip.unionAll(pieces.map(p => Wkb.writePolygon(Array(bufferConvexRing(p, r, quadsegs)))))
      case other => throw new IllegalArgumentException(s"buffer: unsupported geometry type $other")
    }
  }

  /** One capsule polygon per segment of each path (rectangle + half-disc
    * caps — convex, so it feeds the union/difference kernels directly). */
  private def pathCapsules(lines: Array[Array[Double]], r: Double, quadsegs: Int): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    lines.foreach { path =>
      var i = 0
      while (i < path.length - 2) {
        val ax = path(i); val ay = path(i + 1)
        val bx = path(i + 2); val by = path(i + 3)
        if (ax != bx || ay != by)
          out += Wkb.writePolygon(Array(capsuleRing(ax, ay, bx, by, r, quadsegs)))
        i += 2
      }
    }
    out.toSeq
  }

  private def erode(wkb: Array[Byte], g: Wkb.Geom, r: Double, quadsegs: Int): Option[Array[Byte]] = {
    val boundary = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    g.polygons.foreach(_.rings.foreach { ring =>
      var i = 0
      while (i < ring.length - 2) {
        val ax = ring(i); val ay = ring(i + 1)
        val bx = ring(i + 2); val by = ring(i + 3)
        if (ax != bx || ay != by)
          boundary += Wkb.writePolygon(Array(capsuleRing(ax, ay, bx, by, r, quadsegs)))
        i += 2
      }
    })
    Clip.unionAll(boundary.toSeq) match {
      case None => Some(wkb)
      case Some(band) => Clip.difference(wkb, band)
    }
  }

  /** Regular 4·quadsegs-gon disc, vertices on the radius-r circle. */
  private def discRing(cx: Double, cy: Double, r: Double, quadsegs: Int): Array[Double] = {
    val n = 4 * quadsegs
    val ring = new Array[Double](2 * (n + 1))
    var i = 0
    while (i <= n) {
      val a = 2.0 * math.Pi * i / n
      ring(2 * i) = cx + r * math.cos(a)
      ring(2 * i + 1) = cy + r * math.sin(a)
      i += 1
    }
    ring(2 * n) = ring(0); ring(2 * n + 1) = ring(1)
    ring
  }

  /** Capsule (stadium) around segment A→B: two offset long edges + two
    * half-disc caps; emitted CCW, convex by construction. */
  private def capsuleRing(ax: Double, ay: Double, bx: Double, by: Double,
                          r: Double, quadsegs: Int): Array[Double] = {
    val dx = bx - ax; val dy = by - ay
    val len = math.sqrt(dx * dx + dy * dy)
    val theta = math.atan2(dy, dx)
    val buf = new scala.collection.mutable.ArrayBuffer[Double](4 * (2 * quadsegs + 2))
    // cap at B: from theta − π/2 CCW to theta + π/2
    var i = 0
    val steps = 2 * quadsegs
    while (i <= steps) {
      val a = theta - math.Pi / 2 + math.Pi * i / steps
      buf += bx + r * math.cos(a) += by + r * math.sin(a)
      i += 1
    }
    // cap at A: from theta + π/2 CCW to theta + 3π/2
    i = 0
    while (i <= steps) {
      val a = theta + math.Pi / 2 + math.Pi * i / steps
      buf += ax + r * math.cos(a) += ay + r * math.sin(a)
      i += 1
    }
    buf += buf(0) += buf(1) // close
    buf.toArray
  }

  /** Convex CCW ring ⊕ disc(r): offset each edge outward, join vertices
    * with arcs of ≤ π/(2·quadsegs) steps. Result is convex and CCW. */
  private[core] def bufferConvexRing(ring0: Array[Double], r: Double, quadsegs: Int): Array[Double] = {
    val ring = if (Clip.isCcw(ring0)) ring0 else Clip.reverseRing(ring0)
    val n = ring.length / 2 - 1 // closed
    val maxStep = math.Pi / 2 / quadsegs
    val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < n) {
      val px = ring(2 * ((i + n - 1) % n)); val py = ring(2 * ((i + n - 1) % n) + 1)
      val vx = ring(2 * i); val vy = ring(2 * i + 1)
      val nx2 = ring(2 * (i + 1)); val ny2 = ring(2 * (i + 1) + 1)
      // outward normals of the incident edges (CCW ring ⇒ (dy, −dx)/len)
      val a1 = math.atan2(-(vx - px), vy - py) // angle of prev-edge normal
      val a2 = math.atan2(-(nx2 - vx), ny2 - vy) // angle of next-edge normal
      var sweep = a2 - a1
      while (sweep < 0) sweep += 2 * math.Pi
      if (sweep > math.Pi) sweep = 0 // collinear edges: numerical wrap guard
      val steps = math.max(1, math.ceil(sweep / maxStep).toInt)
      var s = 0
      while (s <= steps) {
        val a = a1 + sweep * s / steps
        buf += vx + r * math.cos(a) += vy + r * math.sin(a)
        s += 1
      }
      i += 1
    }
    buf += buf(0) += buf(1)
    buf.toArray
  }
}
