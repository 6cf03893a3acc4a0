package graft.core

/** Geometry measures over WKB geometries (SURVEY.md §2.7 "Geometry
  * measures/ops"): area, centroid, length/perimeter, min distance, convex
  * hull, vertex count. Behavioral reference: ogr/ogrgeometry.cpp —
  * get_Area (ring shoelace, holes subtract), Centroid (:6526, GEOS
  * area-weighted), Distance (:3818), ConvexHull (:4449).
  *
  * Determinism note: every accumulation runs in a FIXED order (ring order,
  * vertex order) so results are reproducible bit-for-bit across partitions
  * and against oracle SQL that spells out the same IEEE op sequence.
  */
object GeomOps {

  /** Signed double-area (2×shoelace) of one ring, fixed accumulation order:
    * Σ (x_i·y_{i+1} − x_{i+1}·y_i). Positive = counter-clockwise. */
  def ringCross2(ring: Array[Double]): Double = {
    var s = 0.0
    val n = ring.length / 2
    var i = 0
    while (i < n - 1) {
      s += ring(2 * i) * ring(2 * i + 3) - ring(2 * i + 2) * ring(2 * i + 1)
      i += 1
    }
    // rings are stored closed (first == last) so the wrap term is already in
    s
  }

  def ringArea(ring: Array[Double]): Double = math.abs(ringCross2(ring)) * 0.5

  /** Polygon area: |outer| − Σ|holes| (OGR get_Area semantics); multipolygon
    * sums parts; points/lines → 0. */
  def area(wkb: Array[Byte]): Double = {
    val g = Wkb.read(wkb)
    var total = 0.0
    var p = 0
    while (p < g.polygons.length) {
      val rings = g.polygons(p).rings
      if (rings.nonEmpty) {
        total += ringArea(rings(0))
        var r = 1
        while (r < rings.length) { total -= ringArea(rings(r)); r += 1 }
      }
      p += 1
    }
    total
  }

  /** Perimeter of polygons / length of linestrings. */
  def length(wkb: Array[Byte]): Double = {
    val g = Wkb.read(wkb)
    var total = 0.0
    @inline def pathLen(coords: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < coords.length - 2) {
        val dx = coords(i + 2) - coords(i)
        val dy = coords(i + 3) - coords(i + 1)
        s += math.sqrt(dx * dx + dy * dy)
        i += 2
      }
      s
    }
    g.geomType match {
      case Wkb.LineStringType => total = pathLen(g.points)
      case Wkb.MultiLineStringType =>
        var l = 0
        while (l < g.lines.length) { total += pathLen(g.lines(l)); l += 1 }
      case Wkb.PolygonType | Wkb.MultiPolygonType =>
        var p = 0
        while (p < g.polygons.length) {
          val rings = g.polygons(p).rings
          var r = 0
          while (r < rings.length) { total += pathLen(rings(r)); r += 1 }
          p += 1
        }
      case _ => ()
    }
    total
  }

  /** Area-weighted centroid (cx, cy). Polygon formula with holes carrying
    * negative weight; degenerate (zero-area) input falls back to the vertex
    * mean. Point → itself. */
  def centroid(wkb: Array[Byte]): (Double, Double) = {
    val g = Wkb.read(wkb)
    if (g.geomType == Wkb.PointType) return (g.points(0), g.points(1))
    if (g.geomType == Wkb.LineStringType) {
      // length-weighted midpoint accumulation
      var sx = 0.0; var sy = 0.0; var sl = 0.0
      var i = 0
      while (i < g.points.length - 2) {
        val x0 = g.points(i); val y0 = g.points(i + 1)
        val x1 = g.points(i + 2); val y1 = g.points(i + 3)
        val l = math.sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))
        sx += (x0 + x1) * 0.5 * l; sy += (y0 + y1) * 0.5 * l; sl += l
        i += 2
      }
      return if (sl == 0.0) (g.points(0), g.points(1)) else (sx / sl, sy / sl)
    }
    var cross = 0.0; var cx = 0.0; var cy = 0.0
    var vx = 0.0; var vy = 0.0; var vn = 0
    var p = 0
    while (p < g.polygons.length) {
      val rings = g.polygons(p).rings
      var r = 0
      while (r < rings.length) {
        val ring = rings(r)
        // holes wind opposite in valid data; rely on sign of the cross terms
        // only within a ring; apply hole sign explicitly for robustness
        val sign = if (r == 0) 1.0 else -1.0
        var localCross = 0.0; var localCx = 0.0; var localCy = 0.0
        val n = ring.length / 2
        var i = 0
        while (i < n - 1) {
          val x0 = ring(2 * i); val y0 = ring(2 * i + 1)
          val x1 = ring(2 * i + 2); val y1 = ring(2 * i + 3)
          val c = x0 * y1 - x1 * y0
          localCross += c
          localCx += (x0 + x1) * c
          localCy += (y0 + y1) * c
          i += 1
        }
        // normalize ring orientation so outer adds, holes subtract
        val orient = if (localCross >= 0) 1.0 else -1.0
        cross += sign * orient * localCross
        cx += sign * orient * localCx
        cy += sign * orient * localCy
        var k = 0
        while (k < n - 1) { vx += ring(2 * k); vy += ring(2 * k + 1); vn += 1; k += 1 }
        r += 1
      }
      p += 1
    }
    if (cross == 0.0) {
      if (vn == 0) (0.0, 0.0) else (vx / vn, vy / vn)
    } else (cx / (3.0 * cross), cy / (3.0 * cross))
  }

  /** Vertex count (closing vertices included, OGR getNumPoints style). */
  def numPoints(wkb: Array[Byte]): Int = {
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.PointType => 1
      case Wkb.LineStringType => g.points.length / 2
      case _ =>
        var n = 0
        var p = 0
        while (p < g.polygons.length) {
          val rings = g.polygons(p).rings
          var r = 0
          while (r < rings.length) { n += rings(r).length / 2; r += 1 }
          p += 1
        }
        n
    }
  }

  // ---- distance ------------------------------------------------------------

  @inline private def d2(x0: Double, y0: Double, x1: Double, y1: Double): Double = {
    val dx = x1 - x0; val dy = y1 - y0
    dx * dx + dy * dy
  }

  /** Squared point→segment distance. */
  def pointSegD2(px: Double, py: Double, x0: Double, y0: Double, x1: Double, y1: Double): Double = {
    val dx = x1 - x0; val dy = y1 - y0
    val len2 = dx * dx + dy * dy
    if (len2 == 0.0) return d2(px, py, x0, y0)
    var t = ((px - x0) * dx + (py - y0) * dy) / len2
    if (t < 0.0) t = 0.0 else if (t > 1.0) t = 1.0
    d2(px, py, x0 + t * dx, y0 + t * dy)
  }

  /** Squared segment→segment distance (0 when they intersect). */
  def segSegD2(ax0: Double, ay0: Double, ax1: Double, ay1: Double,
               bx0: Double, by0: Double, bx1: Double, by1: Double): Double = {
    if (segmentsIntersect(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)) return 0.0
    var m = pointSegD2(ax0, ay0, bx0, by0, bx1, by1)
    m = math.min(m, pointSegD2(ax1, ay1, bx0, by0, bx1, by1))
    m = math.min(m, pointSegD2(bx0, by0, ax0, ay0, ax1, ay1))
    math.min(m, pointSegD2(bx1, by1, ax0, ay0, ax1, ay1))
  }

  private def segmentsIntersect(ax0: Double, ay0: Double, ax1: Double, ay1: Double,
                                bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean = {
    @inline def orient(ox: Double, oy: Double, px: Double, py: Double, qx: Double, qy: Double): Double =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    val d1 = orient(bx0, by0, bx1, by1, ax0, ay0)
    val d2o = orient(bx0, by0, bx1, by1, ax1, ay1)
    val d3 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    val d4 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    if (((d1 > 0 && d2o < 0) || (d1 < 0 && d2o > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    @inline def onSeg(ox: Double, oy: Double, px: Double, py: Double, qx: Double, qy: Double): Boolean =
      math.min(ox, px) <= qx && qx <= math.max(ox, px) &&
        math.min(oy, py) <= qy && qy <= math.max(oy, py)
    (d1 == 0 && onSeg(bx0, by0, bx1, by1, ax0, ay0)) ||
      (d2o == 0 && onSeg(bx0, by0, bx1, by1, ax1, ay1)) ||
      (d3 == 0 && onSeg(ax0, ay0, ax1, ay1, bx0, by0)) ||
      (d4 == 0 && onSeg(ax0, ay0, ax1, ay1, bx1, by1))
  }

  private def boundarySegments(g: Wkb.Geom): Iterator[(Double, Double, Double, Double)] = {
    g.geomType match {
      case Wkb.LineStringType =>
        (0 until g.points.length / 2 - 1).iterator.map(i =>
          (g.points(2 * i), g.points(2 * i + 1), g.points(2 * i + 2), g.points(2 * i + 3)))
      case _ =>
        g.polygons.iterator.flatMap(_.rings.iterator.flatMap { ring =>
          (0 until ring.length / 2 - 1).iterator.map(i =>
            (ring(2 * i), ring(2 * i + 1), ring(2 * i + 2), ring(2 * i + 3)))
        })
    }
  }

  private def insideTest(wkb: Array[Byte], g: Wkb.Geom, x: Double, y: Double): Boolean =
    g.polygons.nonEmpty && Pip.contains(wkb, x, y)

  /** Min euclidean distance between two geometries (OGR Distance
    * semantics): 0 when they touch/overlap, else min over boundary pairs. */
  def distance(aWkb: Array[Byte], bWkb: Array[Byte]): Double = {
    val a = Wkb.read(aWkb)
    val b = Wkb.read(bWkb)
    (a.geomType, b.geomType) match {
      case (Wkb.PointType, Wkb.PointType) =>
        val dx = b.points(0) - a.points(0)
        val dy = b.points(1) - a.points(1)
        math.sqrt(dx * dx + dy * dy)
      case (Wkb.PointType, _) => pointToGeom(a.points(0), a.points(1), bWkb, b)
      case (_, Wkb.PointType) => pointToGeom(b.points(0), b.points(1), aWkb, a)
      case _ =>
        // containment ⇒ 0 (sample one vertex of each against the other)
        val aSegs = boundarySegments(a).toArray
        val bSegs = boundarySegments(b).toArray
        if (aSegs.isEmpty || bSegs.isEmpty) return 0.0
        if (insideTest(bWkb, b, aSegs(0)._1, aSegs(0)._2)) return 0.0
        if (insideTest(aWkb, a, bSegs(0)._1, bSegs(0)._2)) return 0.0
        var m = Double.MaxValue
        var i = 0
        while (i < aSegs.length) {
          val (ax0, ay0, ax1, ay1) = aSegs(i)
          var j = 0
          while (j < bSegs.length) {
            val (bx0, by0, bx1, by1) = bSegs(j)
            val dd = segSegD2(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
            if (dd < m) m = dd
            if (m == 0.0) return 0.0
            j += 1
          }
          i += 1
        }
        math.sqrt(m)
    }
  }

  private def pointToGeom(px: Double, py: Double, gWkb: Array[Byte], g: Wkb.Geom): Double = {
    if (insideTest(gWkb, g, px, py)) return 0.0
    var m = Double.MaxValue
    val it = boundarySegments(g)
    while (it.hasNext) {
      val (x0, y0, x1, y1) = it.next()
      val dd = pointSegD2(px, py, x0, y0, x1, y1)
      if (dd < m) m = dd
    }
    if (m == Double.MaxValue) 0.0 else math.sqrt(m)
  }

  // ---- convex hull ---------------------------------------------------------

  /** Concave hull of all vertices (chi-shape over the Delaunay core; the
    * gdalalg_vector_concave_hull.cpp / GEOS ConcaveHull ratio contract:
    * 1 → convex hull, → 0 → maximally concave). Falls back to the convex
    * hull on degenerate inputs (collinear, < 3 distinct points). */
  def concaveHull(wkb: Array[Byte], ratio: Double): Array[Byte] = {
    val g = Wkb.read(wkb)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < g.points.length) { buf += ((g.points(i), g.points(i + 1))); i += 2 }
    g.lines.foreach { line =>
      var j = 0
      while (j < line.length) { buf += ((line(j), line(j + 1))); j += 2 }
    }
    g.polygons.foreach(_.rings.foreach { ring =>
      var j = 0
      while (j < ring.length - 2) { buf += ((ring(j), ring(j + 1))); j += 2 }
    })
    val pts = buf.distinct.toArray
    if (pts.length < 3) return convexHull(wkb)
    val ring = ConcaveHull.hullRing(pts.map(_._1), pts.map(_._2), ratio)
    if (ring == null) convexHull(wkb) else Wkb.writePolygon(Array(ring))
  }

  /** Convex hull of all vertices (Andrew monotone chain) → polygon WKB.
    * Degenerate inputs (<3 distinct points) return a polygon collapsing to
    * the available points (matching the practical use: hull of footprints). */
  def convexHull(wkb: Array[Byte]): Array[Byte] = {
    val g = Wkb.read(wkb)
    val ptsBuf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    if (g.points.nonEmpty) {
      var i = 0
      while (i < g.points.length) { ptsBuf += ((g.points(i), g.points(i + 1))); i += 2 }
    }
    g.polygons.foreach(_.rings.foreach { ring =>
      var i = 0
      while (i < ring.length - 2) { ptsBuf += ((ring(i), ring(i + 1))); i += 2 }
    })
    val pts = ptsBuf.distinct.sorted.toArray
    if (pts.length < 3) {
      val ring = (pts ++ pts.reverse ++ pts.take(1)).flatMap(p => Array(p._1, p._2))
      return Wkb.writePolygon(Array(ring))
    }
    @inline def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    pts.foreach { p =>
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0) lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    pts.reverseIterator.foreach { p =>
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0) upper.remove(upper.length - 1)
      upper += p
    }
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toArray
    val ring = new Array[Double](2 * (hull.length + 1))
    var i = 0
    while (i < hull.length) { ring(2 * i) = hull(i)._1; ring(2 * i + 1) = hull(i)._2; i += 1 }
    ring(2 * hull.length) = hull(0)._1; ring(2 * hull.length + 1) = hull(0)._2
    Wkb.writePolygon(Array(ring))
  }

  // ---- vertex-wise CRS reprojection ---------------------------------------

  /** st_transform: reproject every vertex (the OGRWarpedLayer analog,
    * ogr/ogrsf_frmts/generic/ogrwarpedlayer.h:33 — geometry decorator
    * transforming coordinates on the fly). Straight edges are NOT
    * densified (same as the reference's per-vertex transform). */
  def transform(wkb: Array[Byte], fromSrid: Int, toSrid: Int): Array[Byte] = {
    if (fromSrid == toSrid) return wkb
    @inline def tx(x: Double, y: Double): (Double, Double) =
      CrsTransform.transform(fromSrid, toSrid, x, y)
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.PointType =>
        val (x, y) = tx(g.points(0), g.points(1))
        Wkb.writePoint(x, y)
      case Wkb.LineStringType =>
        val out = new Array[Double](g.points.length)
        var i = 0
        while (i < g.points.length) {
          val (x, y) = tx(g.points(i), g.points(i + 1))
          out(i) = x; out(i + 1) = y; i += 2
        }
        val bb = java.nio.ByteBuffer.allocate(9 + 8 * out.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1: Byte).putInt(Wkb.LineStringType).putInt(out.length / 2)
        out.foreach(bb.putDouble)
        bb.array()
      case Wkb.PolygonType =>
        Wkb.writePolygon(g.polygons(0).rings.map(transformRing(_, tx)))
      case Wkb.MultiPolygonType =>
        Wkb.writeMultiPolygon(g.polygons.map(_.rings.map(transformRing(_, tx))))
      case other => throw new IllegalArgumentException(s"st_transform: unsupported type $other")
    }
  }

  private def transformRing(ring: Array[Double], tx: (Double, Double) => (Double, Double)): Array[Double] = {
    val out = new Array[Double](ring.length)
    var i = 0
    while (i < ring.length) {
      val (x, y) = tx(ring(i), ring(i + 1))
      out(i) = x; out(i + 1) = y; i += 2
    }
    out
  }

  // ---- geometry ETL steps (apps/gdalalg_vector_* one file per op) ----

  /** swap_xy (gdalalg_vector_swap_xy semantics): exchange coordinates. */
  def swapXY(wkb: Array[Byte]): Array[Byte] =
    mapCoords(wkb, (x, y) => (y, x))

  private def mapCoords(wkb: Array[Byte], f: (Double, Double) => (Double, Double)): Array[Byte] = {
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.PointType =>
        val (x, y) = f(g.points(0), g.points(1)); Wkb.writePoint(x, y)
      case Wkb.LineStringType =>
        val out = new Array[Double](g.points.length)
        var i = 0
        while (i < g.points.length) {
          val (x, y) = f(g.points(i), g.points(i + 1)); out(i) = x; out(i + 1) = y; i += 2
        }
        val bb = java.nio.ByteBuffer.allocate(9 + 8 * out.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1: Byte).putInt(Wkb.LineStringType).putInt(out.length / 2)
        out.foreach(bb.putDouble)
        bb.array()
      case Wkb.PolygonType => Wkb.writePolygon(g.polygons(0).rings.map(transformRing(_, f)))
      case Wkb.MultiPolygonType => Wkb.writeMultiPolygon(g.polygons.map(_.rings.map(transformRing(_, f))))
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  /** segmentize (gdalalg_vector_segmentize / OGRGeometry::segmentize
    * semantics): insert vertices so no segment exceeds maxLen; each
    * segment of length L splits into ceil(L/maxLen) equal parts. */
  def segmentize(wkb: Array[Byte], maxLen: Double): Array[Byte] = {
    require(maxLen > 0, "segmentize: maxLen must be positive")
    def seg(path: Array[Double]): Array[Double] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < path.length - 2) {
        val x0 = path(i); val y0 = path(i + 1)
        val x1 = path(i + 2); val y1 = path(i + 3)
        val len = math.sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))
        val parts = math.max(1, math.ceil(len / maxLen).toInt)
        var p = 0
        while (p < parts) {
          val t = p.toDouble / parts
          out += x0 + t * (x1 - x0) += y0 + t * (y1 - y0)
          p += 1
        }
        i += 2
      }
      out += path(path.length - 2) += path(path.length - 1)
      out.toArray
    }
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.PointType => wkb
      case Wkb.LineStringType =>
        val out = seg(g.points)
        val bb = java.nio.ByteBuffer.allocate(9 + 8 * out.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1: Byte).putInt(Wkb.LineStringType).putInt(out.length / 2)
        out.foreach(bb.putDouble)
        bb.array()
      case Wkb.PolygonType => Wkb.writePolygon(g.polygons(0).rings.map(seg))
      case Wkb.MultiPolygonType => Wkb.writeMultiPolygon(g.polygons.map(_.rings.map(seg)))
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  /** Douglas–Peucker simplification (gdalalg_vector_simplify / OGR
    * SimplifyPreserveTopology's moral: drop vertices within `tolerance`
    * of the chord). Rings keep ≥ 4 points (triangle + close). */
  def simplify(wkb: Array[Byte], tolerance: Double): Array[Byte] = {
    def dp(path: Array[Double], closed: Boolean): Array[Double] = {
      val n = path.length / 2
      if (n <= (if (closed) 4 else 2)) return path
      val keep = new Array[Boolean](n)
      keep(0) = true; keep(n - 1) = true
      def rec(i0: Int, i1: Int): Unit = {
        if (i1 - i0 < 2) return
        var worst = -1.0
        var wIdx = -1
        var i = i0 + 1
        while (i < i1) {
          val d2 = pointSegD2(path(2 * i), path(2 * i + 1),
            path(2 * i0), path(2 * i0 + 1), path(2 * i1), path(2 * i1 + 1))
          if (d2 > worst) { worst = d2; wIdx = i }
          i += 1
        }
        if (worst > tolerance * tolerance) {
          keep(wIdx) = true
          rec(i0, wIdx); rec(wIdx, i1)
        }
      }
      if (closed) {
        // anchor a second point (farthest from start) so a ring can't
        // collapse to its chord
        var far = 1; var fd = -1.0
        var i = 1
        while (i < n - 1) {
          val dx = path(2 * i) - path(0); val dy = path(2 * i + 1) - path(1)
          if (dx * dx + dy * dy > fd) { fd = dx * dx + dy * dy; far = i }
          i += 1
        }
        keep(far) = true
        rec(0, far); rec(far, n - 1)
      } else rec(0, n - 1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      var k = 0
      while (k < n) {
        if (keep(k)) { out += path(2 * k) += path(2 * k + 1) }
        k += 1
      }
      out.toArray
    }
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.PointType => wkb
      case Wkb.LineStringType =>
        val out = dp(g.points, closed = false)
        val bb = java.nio.ByteBuffer.allocate(9 + 8 * out.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1: Byte).putInt(Wkb.LineStringType).putInt(out.length / 2)
        out.foreach(bb.putDouble)
        bb.array()
      case Wkb.PolygonType => Wkb.writePolygon(g.polygons(0).rings.map(dp(_, closed = true)))
      case Wkb.MultiPolygonType => Wkb.writeMultiPolygon(g.polygons.map(_.rings.map(dp(_, closed = true))))
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  /** SimplifyPreserveTopology (ogrgeometry.cpp:6856 — GEOS
    * TopologyPreservingSimplifier semantics, behavior only): per-ring
    * Douglas–Peucker exactly as [[simplify]], then dropped vertices are
    * RESTORED — largest current chord deviation first — until the
    * polygon is topologically sound: every ring keeps ≥ 3 distinct
    * vertices with nonzero area, and no self-intersection or cross-ring
    * conflict exists ([[MakeValid.isValidRings]]). Plain DP collapses a
    * sliver ring to its chord and can fold a concave ring into a bowtie
    * at coarse tolerances; this variant never does — the guarantee the
    * reference's *PreserveTopology entry point gives production ETL.
    * Points/LineStrings fall through to plain DP (no ring topology; DP
    * always keeps the endpoints). */
  def simplifyTopo(wkb: Array[Byte], tolerance: Double): Array[Byte] = {
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.PointType | Wkb.LineStringType => simplify(wkb, tolerance)
      case Wkb.PolygonType =>
        Wkb.writePolygon(topoRings(g.polygons(0).rings, tolerance))
      case Wkb.MultiPolygonType =>
        Wkb.writeMultiPolygon(g.polygons.map(p => topoRings(p.rings, tolerance)))
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  /** One polygon's rings through DP + the topology-restoring loop. */
  private def topoRings(rings: Array[Array[Double]], tol: Double): Array[Array[Double]] = {
    val keeps = rings.map(r => dpKeepClosed(r, tol))
    def assemble(ri: Int): Array[Double] = {
      val r = rings(ri); val k = keeps(ri)
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < k.length) {
        if (k(i)) { out += r(2 * i) += r(2 * i + 1) }
        i += 1
      }
      out.toArray
    }
    @inline def shoelace(ring: Array[Double]): Double = {
      var s = 0.0; var i = 0; val n = ring.length / 2
      while (i < n) {
        val j = (i + 1) % n
        s += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
        i += 1
      }
      s
    }
    var guard = rings.map(_.length / 2).sum
    while (guard >= 0) {
      val cand = rings.indices.map(assemble).toArray
      val ok = cand.forall(c => c.length >= 8 && shoelace(c) != 0.0) &&
        MakeValid.isValidRings(cand.toSeq)
      if (ok) return cand
      // restore the dropped vertex farthest from its current kept chord
      var bestR = -1; var bestI = -1; var bestD = -1.0
      var ri = 0
      while (ri < rings.length) {
        val r = rings(ri); val k = keeps(ri); val n = k.length
        var lo = 0
        var i = 1
        while (i < n) {
          if (k(i)) lo = i
          else {
            var hi = i + 1
            while (hi < n && !k(hi)) hi += 1
            val d2 = pointSegD2(r(2 * i), r(2 * i + 1),
              r(2 * lo), r(2 * lo + 1), r(2 * hi), r(2 * hi + 1))
            if (d2 > bestD) { bestD = d2; bestR = ri; bestI = i }
          }
          i += 1
        }
        ri += 1
      }
      require(bestR >= 0, "simplifyTopo: no vertex left to restore on an invalid input")
      keeps(bestR)(bestI) = true
      guard -= 1
    }
    throw new IllegalStateException("simplifyTopo: restore loop did not converge")
  }

  /** The [[simplify]] closed-ring DP keep mask (start/end, the farthest
    * anchor, and every vertex whose recursive chord deviation exceeds
    * the tolerance). */
  private def dpKeepClosed(path: Array[Double], tolerance: Double): Array[Boolean] = {
    val n = path.length / 2
    val keep = new Array[Boolean](n)
    if (n <= 4) { java.util.Arrays.fill(keep, true); return keep }
    keep(0) = true; keep(n - 1) = true
    def rec(i0: Int, i1: Int): Unit = {
      if (i1 - i0 < 2) return
      var worst = -1.0
      var wIdx = -1
      var i = i0 + 1
      while (i < i1) {
        val d2 = pointSegD2(path(2 * i), path(2 * i + 1),
          path(2 * i0), path(2 * i0 + 1), path(2 * i1), path(2 * i1 + 1))
        if (d2 > worst) { worst = d2; wIdx = i }
        i += 1
      }
      if (worst > tolerance * tolerance) {
        keep(wIdx) = true
        rec(i0, wIdx); rec(wIdx, i1)
      }
    }
    var far = 1; var fd = -1.0
    var i = 1
    while (i < n - 1) {
      val dx = path(2 * i) - path(0); val dy = path(2 * i + 1) - path(1)
      if (dx * dx + dy * dy > fd) { fd = dx * dx + dy * dy; far = i }
      i += 1
    }
    keep(far) = true
    rec(0, far); rec(far, n - 1)
    keep
  }

  /** explode_collections (gdalalg_vector_explode_collections): one WKB
    * per part; single geometries pass through as one element. */
  def dump(wkb: Array[Byte]): Array[Array[Byte]] = {
    val g = Wkb.read(wkb)
    g.geomType match {
      case Wkb.MultiPolygonType => g.polygons.map(p => Wkb.writePolygon(p.rings))
      case _ => Array(wkb)
    }
  }
}
