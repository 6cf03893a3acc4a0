package graft.core

import scala.collection.mutable

/** Iso-line extraction by marching squares (SURVEY.md §2.8; reference:
  * alg/contour.cpp GDALContourGenerateEx + alg/marching_squares/ —
  * behavior only, re-implemented from the published algorithm).
  *
  * Grid nodes are pixel centers; crossing positions are linearly
  * interpolated; saddle cells disambiguate on the cell-center average.
  * Segments are chained into maximal polylines (closed ring or open line
  * ending at the raster edge). Per-image operation — corpus images are
  * independent, no cross-image stitching.
  */
object Contour {
  final case class Line(level: Double, coords: Array[Double]) {
    def nPoints: Int = coords.length / 2
    def closed: Boolean = nPoints > 2 && coords(0) == coords(coords.length - 2) &&
      coords(1) == coords(coords.length - 1)
  }

  /** Contours of a band at the given levels, in PIXEL-CENTER coordinates
    * transformed through gt (pass the identity-ish gt for pixel space). */
  def contours(band: Array[Int], w: Int, h: Int, gt: Array[Double], levels: Seq[Double]): Seq[Line] =
    levels.flatMap(l => contourLevel(band, w, h, gt, l))

  private final case class Seg(x1: Double, y1: Double, x2: Double, y2: Double)

  private def contourLevel(band: Array[Int], w: Int, h: Int, gt: Array[Double], level: Double): Seq[Line] = {
    @inline def v(x: Int, y: Int): Double = band(y * w + x).toDouble
    val segs = mutable.ArrayBuffer.empty[Seg]
    // cell (cx, cy) spans pixel centers (cx,cy)..(cx+1,cy+1)
    var cy = 0
    while (cy < h - 1) {
      var cx = 0
      while (cx < w - 1) {
        val tl = v(cx, cy); val tr = v(cx + 1, cy)
        val bl = v(cx, cy + 1); val br = v(cx + 1, cy + 1)
        var code = 0
        if (tl >= level) code |= 1
        if (tr >= level) code |= 2
        if (br >= level) code |= 4
        if (bl >= level) code |= 8
        if (code != 0 && code != 15) {
          // interpolated crossing points on the 4 edges (pixel-center space)
          @inline def interp(a: Double, b: Double): Double =
            if (a == b) 0.5 else (level - a) / (b - a)
          val top = (cx + 0.5 + interp(tl, tr), cy + 0.5)
          val bottom = (cx + 0.5 + interp(bl, br), cy + 1.5)
          val left = (cx + 0.5, cy + 0.5 + interp(tl, bl))
          val right = (cx + 1.5, cy + 0.5 + interp(tr, br))
          @inline def add(p: (Double, Double), q: (Double, Double)): Unit =
            segs += Seg(p._1, p._2, q._1, q._2)
          code match {
            case 1 | 14 => add(left, top)
            case 2 | 13 => add(top, right)
            case 4 | 11 => add(right, bottom)
            case 8 | 7 => add(bottom, left)
            case 3 | 12 => add(left, right)
            case 6 | 9 => add(top, bottom)
            case 5 => // saddle: split on the center average
              if ((tl + tr + bl + br) / 4.0 >= level) { add(left, top); add(right, bottom) }
              else { add(left, bottom); add(right, top) }
            case 10 =>
              if ((tl + tr + bl + br) / 4.0 >= level) { add(bottom, left); add(top, right) }
              else { add(top, left); add(bottom, right) }
            case _ => // 0 | 15: no crossing
          }
        }
        cx += 1
      }
      cy += 1
    }
    chain(segs.toSeq).map { coords =>
      // pixel space → geo space through gt
      val out = new Array[Double](coords.length)
      var i = 0
      while (i < coords.length) {
        out(i) = GeoTransform.applyX(gt, coords(i), coords(i + 1))
        out(i + 1) = GeoTransform.applyY(gt, coords(i), coords(i + 1))
        i += 2
      }
      Line(level, out)
    }
  }

  /** One level interval's polygon output (iso-POLYGON mode): the region
    * where lvlLo <= v < lvlHi, as nPieces disjoint convex pieces with
    * exact quantized area (units of 2^-23 cell²) and an optional
    * multipolygon WKB in geo coordinates. */
  final case class Band(iv: Int, lvlLo: Double, lvlHi: Double,
                        nPieces: Int, areaQ: Long, wkb: Array[Byte])

  /** Full triangle area (cell²/4) in areaQ units (2^-23 cell²). */
  val FullTriQ: Long = 2L * 1024L * 1024L

  /** Quantized crossing fraction (in 1/1024 edge units) of level L on the
    * edge from value x to value y — round is HALF_UP in both engines, and
    * exact .5 ties are impossible for integer-valued rasters with the
    * 1024 quantum (a tie needs 2-adic valuation ≥ 11 on an edge delta
    * ≤ 2^10; see q39 oracle derivation). */
  @inline def crossFq(x: Double, y: Double, level: Double): Long =
    math.round(1024.0 * (level - x) / (y - x))

  /** Area (areaQ units) of {v >= L} within ONE center-split triangle with
    * vertex values (va, vb, vc), under barycentric-linear interpolation
    * with 1/1024-quantized edge crossings. Closed form: a one-vertex cut
    * from apex with leg fractions f, g is exactly 2·f·g (the lattice
    * shoelace identity the SQL oracle mirrors). */
  def triAreaGeq(va: Double, vb: Double, vc: Double, level: Double): Long = {
    val ba = va >= level; val bb = vb >= level; val bc = vc >= level
    val n = (if (ba) 1 else 0) + (if (bb) 1 else 0) + (if (bc) 1 else 0)
    n match {
      case 0 => 0L
      case 3 => FullTriQ
      case 1 =>
        if (ba) 2L * crossFq(va, vb, level) * crossFq(va, vc, level)
        else if (bb) 2L * crossFq(vb, va, level) * crossFq(vb, vc, level)
        else 2L * crossFq(vc, va, level) * crossFq(vc, vb, level)
      case _ =>
        if (!ba) FullTriQ - 2L * crossFq(va, vb, level) * crossFq(va, vc, level)
        else if (!bb) FullTriQ - 2L * crossFq(vb, va, level) * crossFq(vb, vc, level)
        else FullTriQ - 2L * crossFq(vc, va, level) * crossFq(vc, vb, level)
    }
  }

  /** Iso-polygon extraction between consecutive levels (reference:
    * alg/contour.cpp:569 GDALContourGenerateEx polygon branch +
    * alg/marching_squares/polygon_ring_appender.h — behavior only).
    * Emits one Band per interval: (-inf, l1), [l1, l2), ..., [ln, +inf).
    *
    * Geometry variant (documented): each cell square is split into 4
    * triangles at its center (center value = corner average — the same
    * disambiguation the line writer applies to saddles), so every band
    * piece is CONVEX and the interval region is a disjoint convex-piece
    * multipolygon: same class coverage as the reference's merged rings,
    * exactly additive area (ring merging is available downstream via
    * st_union_agg). Crossing quantization puts all vertices on a
    * 1/2048-cell lattice, making areas exact int64 — the q39 SQL oracle
    * re-derives the per-interval area sums from the pixel grid. */
  def bands(band: Array[Int], w: Int, h: Int, gt: Array[Double],
            levels: Seq[Double], emitWkb: Boolean): Seq[Band] = {
    val ls = levels.sorted.toArray
    val nIv = ls.length + 1
    val areas = new Array[Long](nIv)
    val counts = new Array[Int](nIv)
    val rings: Array[mutable.ArrayBuffer[Array[Double]]] =
      if (emitWkb) Array.fill(nIv)(mutable.ArrayBuffer.empty[Array[Double]]) else null
    @inline def v(x: Int, y: Int): Double = band(y * w + x).toDouble
    // triangle walk buffers (≤ 3 vertices + 2 crossings per edge)
    val px = new Array[Double](12); val py = new Array[Double](12)
    var cy = 0
    while (cy < h - 1) {
      var cx = 0
      while (cx < w - 1) {
        val tl = v(cx, cy); val tr = v(cx + 1, cy)
        val bl = v(cx, cy + 1); val br = v(cx + 1, cy + 1)
        val c4 = (tl + tr + br + bl) / 4.0 // dyadic: exact in double
        // triangles (P0, P1, C) in boundary-walk order; lattice coords in
        // 1/2048-cell units relative to the cell's TL pixel center
        val tvals = Array(tl, tr, br, bl)
        val txs = Array(0L, 2048L, 2048L, 0L)
        val tys = Array(0L, 0L, 2048L, 2048L)
        var t = 0
        while (t < 4) {
          val va = tvals(t); val vb = tvals((t + 1) % 4)
          val ax = txs(t); val ay = tys(t)
          val bx = txs((t + 1) % 4); val by = tys((t + 1) % 4)
          var iv = 0
          while (iv < nIv) {
            val lo = if (iv == 0) Double.NegativeInfinity else ls(iv - 1)
            val hi = if (iv == nIv - 1) Double.PositiveInfinity else ls(iv)
            val aLo = if (iv == 0) FullTriQ else triAreaGeq(va, vb, c4, lo)
            val aHi = if (iv == nIv - 1) 0L else triAreaGeq(va, vb, c4, hi)
            val dq = aLo - aHi
            if (dq > 0L) {
              counts(iv) += 1
              areas(iv) += dq
              if (emitWkb) {
                val n = walkBand(va, vb, c4, ax, ay, bx, by, lo, hi, px, py)
                if (n >= 3) {
                  // lattice → pixel-center space → geo space, closed ring
                  val ring = new Array[Double]((n + 1) * 2)
                  var i = 0
                  while (i <= n) {
                    val j = i % n
                    val pxx = cx + 0.5 + px(j) / 2048.0
                    val pyy = cy + 0.5 + py(j) / 2048.0
                    ring(2 * i) = GeoTransform.applyX(gt, pxx, pyy)
                    ring(2 * i + 1) = GeoTransform.applyY(gt, pxx, pyy)
                    i += 1
                  }
                  rings(iv) += ring
                }
              }
            }
            iv += 1
          }
          t += 1
        }
        cx += 1
      }
      cy += 1
    }
    (0 until nIv).map { iv =>
      val lo = if (iv == 0) Double.NegativeInfinity else ls(iv - 1)
      val hi = if (iv == nIv - 1) Double.PositiveInfinity else ls(iv)
      val wkb =
        if (emitWkb && rings(iv).nonEmpty)
          Wkb.writeMultiPolygon(rings(iv).toArray.map(r => Array(r)))
        else null
      Band(iv, lo, hi, counts(iv), areas(iv), wkb)
    }
  }

  /** One level interval's MERGED ring output (the reference's actual
    * polygon layer): shells (positive signed area) with nested holes
    * (negative), obtained from the convex pieces of `bands` by exact
    * directed-edge cancellation. ringAreaQ is the signed shoelace sum
    * over all rings in areaQ units (2^-23 cell²) and equals the
    * triangle-sum interval area exactly — the q155 oracle invariant. */
  final case class RingBand(iv: Int, lvlLo: Double, lvlHi: Double,
                            nShells: Int, nHoles: Int, ringAreaQ: Long, wkb: Array[Byte])

  /** Iso-polygon rings between consecutive levels (reference:
    * alg/contour.cpp:569 polygonize branch + the ring merging of
    * alg/marching_squares/polygon_ring_appender.h — behavior only).
    *
    * All piece vertices live on the exact 1/2048-cell integer lattice
    * (corner vertices are multiples of 2048; 1/1024-quantized crossings
    * land on even lattice points on corner-corner edges and integer
    * points on corner-center edges), so borders shared by two pieces of
    * the same interval produce exactly opposite directed edges, which
    * cancel; the survivors are the region boundary. Face tracing with a
    * max-CCW-turn rule at pinch vertices (saddle points) splits the
    * boundary into simple rings; raw-shoelace sign classifies shell vs
    * hole (pieces are positively oriented), and each hole nests into the
    * smallest shell containing one of its edge midpoints (exact integer
    * even-odd PIP — a hole-edge midpoint cannot lie ON a shell edge,
    * since any geometric overlap between lattice edges of one interval
    * is an exact directed pair and was cancelled). */
  def ringBands(band: Array[Int], w: Int, h: Int, gt: Array[Double],
                levels: Seq[Double], emitWkb: Boolean): Seq[RingBand] =
    // nesting only when WKB is emitted: shell/hole COUNTS and the area sum
    // don't need it, and the hole->shell assignment is the one superlinear
    // step (q155 runs this per image corpus-wide with emitWkb = false)
    traceLayers(band, w, h, levels, needNesting = emitWkb).map { ir =>
      val wkb =
        if (!emitWkb || ir.shellIdx.isEmpty) null
        else Wkb.writeMultiPolygon(ir.shellIdx.map { sIx =>
          (toGeoRing(ir.rings(sIx), gt) +:
            ir.holesOf.getOrElse(sIx, Array.empty[Int]).map(h => toGeoRing(ir.rings(h), gt))).toArray
        })
      RingBand(ir.iv, ir.lo, ir.hi, ir.shellIdx.length,
        ir.nHoles, ir.areas.sum, wkb)
    }

  /** One reference-layout polygon FEATURE: a shell with its nested holes
    * (alg/marching_squares/polygon_ring_appender.h emits one feature per
    * polygon, not one merged multipolygon per interval). featAreaQ is the
    * feature's signed shoelace sum — shell (positive) plus its holes
    * (negative) — in areaQ units; Σ featAreaQ over an interval's features
    * equals the interval's [[RingBand.ringAreaQ]]. */
  final case class RingFeature(iv: Int, lvlLo: Double, lvlHi: Double,
                               nHoles: Int, featAreaQ: Long, wkb: Array[Byte])

  /** Per-feature rows of the ring layer: one row per shell, holes nested
    * — the reference's actual contour-polygon feature layout. Same exact
    * construction as [[ringBands]] (shared trace); the split to features
    * uses the hole→smallest-containing-shell nesting. */
  def ringFeatures(band: Array[Int], w: Int, h: Int, gt: Array[Double],
                   levels: Seq[Double], emitWkb: Boolean): Seq[RingFeature] =
    traceLayers(band, w, h, levels, needNesting = true).flatMap { ir =>
      ir.shellIdx.map { sIx =>
        val holes = ir.holesOf.getOrElse(sIx, Array.empty[Int])
        val area = ir.areas(sIx) + holes.map(ir.areas(_)).sum
        val wkb =
          if (!emitWkb) null
          else Wkb.writeMultiPolygon(Array(
            (toGeoRing(ir.rings(sIx), gt) +: holes.map(h => toGeoRing(ir.rings(h), gt))).toArray))
        RingFeature(ir.iv, ir.lo, ir.hi, holes.length, area, wkb)
      }
    }

  @inline private def ux(p: Long): Long = p >> 32
  @inline private def uy(p: Long): Long = p & 0xffffffffL

  /** Lattice ring → closed geo-coordinate ring through the geotransform
    * (pixel centers sit at +0.5). */
  private def toGeoRing(vs: Array[Long], gt: Array[Double]): Array[Double] = {
    val n = vs.length
    val out = new Array[Double]((n + 1) * 2)
    var i = 0
    while (i <= n) {
      val p = vs(i % n)
      val pxx = 0.5 + ux(p) / 2048.0
      val pyy = 0.5 + uy(p) / 2048.0
      out(2 * i) = GeoTransform.applyX(gt, pxx, pyy)
      out(2 * i + 1) = GeoTransform.applyY(gt, pxx, pyy)
      i += 1
    }
    out
  }

  /** One traced interval: simple rings on the integer lattice, signed
    * shoelace areas, shells (area > 0) in ascending-area order irrelevant
    * — `shellIdx` preserves trace order — and hole→shell nesting. */
  private final case class IntervalRings(iv: Int, lo: Double, hi: Double,
                                         rings: Array[Array[Long]], areas: Array[Long],
                                         shellIdx: Array[Int], nHoles: Int,
                                         holesOf: Map[Int, Array[Int]])

  private def traceLayers(band: Array[Int], w: Int, h: Int,
                          levels: Seq[Double], needNesting: Boolean): Seq[IntervalRings] = {
    // exactness bound, fail-fast (cf. packSequences' capacity cap): the
    // trace's long cross products and the shoelace/PIP arithmetic assume
    // lattice coords < 2^18, i.e. (dim-1)·2048 < 262144 → dims ≤ 129.
    // Tile larger rasters (the corpus path does) before calling.
    require(w >= 2 && h >= 2 && (w - 1).toLong * 2048L < (1L << 18)
      && (h - 1).toLong * 2048L < (1L << 18),
      s"ringBands: raster dims ${w}x$h exceed the 129-px exact-lattice bound — tile first")
    val ls = levels.sorted.toArray
    val nIv = ls.length + 1
    @inline def v(x: Int, y: Int): Double = band(y * w + x).toDouble
    @inline def pack(x: Long, y: Long): Long = (x << 32) | y
    val px = new Array[Double](12); val py = new Array[Double](12)
    val g = new Array[Long](12)
    // one sweep over all cells; per interval an open-addressed primitive
    // edge set does the exact directed-pair cancellation (the boxed-map
    // formulation was ~80× slower and dominated the corpus query)
    val edgeSets = Array.fill(nIv)(new EdgeSet)
    val levelAreas = new Array[Long](ls.length)
    val tvals = new Array[Double](4)
    val txs = Array(0L, 2048L, 2048L, 0L)
    val tys = Array(0L, 0L, 2048L, 2048L)
    var cy = 0
    while (cy < h - 1) {
      var cx = 0
      while (cx < w - 1) {
        val tl = v(cx, cy); val tr = v(cx + 1, cy)
        val bl = v(cx, cy + 1); val br = v(cx + 1, cy + 1)
        val c4 = (tl + tr + br + bl) / 4.0
        tvals(0) = tl; tvals(1) = tr; tvals(2) = br; tvals(3) = bl
        // cell fast path: all four values (hence c4 and every interior
        // point) inside ONE interval → all 4 triangles are full pieces
        // and the 8 center spokes cancel within the cell — emit only the
        // 4 outer directed edges
        val vmin = math.min(math.min(tl, tr), math.min(bl, br))
        val vmax = math.max(math.max(tl, tr), math.max(bl, br))
        var iv0 = 0
        while (iv0 < ls.length && ls(iv0) <= vmin) iv0 += 1
        val cellLo = if (iv0 == 0) Double.NegativeInfinity else ls(iv0 - 1)
        val cellHi = if (iv0 == nIv - 1) Double.PositiveInfinity else ls(iv0)
        if (vmin >= cellLo && vmax < cellHi) {
          val es = edgeSets(iv0)
          val x0 = cx.toLong * 2048L; val y0 = cy.toLong * 2048L
          var t = 0
          while (t < 4) {
            es.addOrCancel(pack(x0 + txs(t), y0 + tys(t)),
              pack(x0 + txs((t + 1) % 4), y0 + tys((t + 1) % 4)))
            t += 1
          }
        } else {
        var t = 0
        while (t < 4) {
          val va = tvals(t); val vb = tvals((t + 1) % 4)
          // each level's {v >= L} area computed ONCE per triangle
          var li = 0
          while (li < ls.length) { levelAreas(li) = triAreaGeq(va, vb, c4, ls(li)); li += 1 }
          var iv = 0
          while (iv < nIv) {
            val aLo = if (iv == 0) FullTriQ else levelAreas(iv - 1)
            val aHi = if (iv == nIv - 1) 0L else levelAreas(iv)
            if (aLo - aHi > 0L) {
              val lo = if (iv == 0) Double.NegativeInfinity else ls(iv - 1)
              val hi = if (iv == nIv - 1) Double.PositiveInfinity else ls(iv)
              val n = walkBand(va, vb, c4, txs(t), tys(t), txs((t + 1) % 4), tys((t + 1) % 4),
                lo, hi, px, py)
              if (n >= 3) {
                var i = 0
                while (i < n) {
                  g(i) = pack(cx.toLong * 2048L + math.round(px(i)),
                    cy.toLong * 2048L + math.round(py(i)))
                  i += 1
                }
                val es = edgeSets(iv)
                i = 0
                while (i < n) { es.addOrCancel(g(i), g((i + 1) % n)); i += 1 }
              }
            }
            iv += 1
          }
          t += 1
        }
        }
        cx += 1
      }
      cy += 1
    }
    (0 until nIv).map { iv =>
      val lo = if (iv == 0) Double.NegativeInfinity else ls(iv - 1)
      val hi = if (iv == nIv - 1) Double.PositiveInfinity else ls(iv)
      // flatten the surviving edges (boundary-sized, tiny vs the input)
      // and face-trace them into rings
      val eFrom = mutable.ArrayBuffer.empty[Long]
      val eTo = mutable.ArrayBuffer.empty[Long]
      edgeSets(iv).foreach { (a, b) => eFrom += a; eTo += b }
      val outIdx = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Int]]
      eFrom.indices.foreach(i => outIdx.getOrElseUpdate(eFrom(i), mutable.ArrayBuffer.empty) += i)
      val used = new Array[Boolean](eFrom.length)
      val rings = mutable.ArrayBuffer.empty[Array[Long]]
      var e0 = 0
      while (e0 < eFrom.length) {
        if (!used(e0)) {
          val verts = mutable.ArrayBuffer.empty[Long]
          var cur = e0
          var closed = false
          while (!closed) {
            used(cur) = true
            val a = eFrom(cur); val b = eTo(cur)
            verts += a
            val dx = ux(b) - ux(a); val dy = uy(b) - uy(a)
            // successor = max CCW turn from the incoming direction: class
            // U-turn(3) > left(2) > straight(1) > right(0); within the
            // left/right half-planes the CCW-most candidate wins (exact
            // long cross products; coords < 2^18 so products fit)
            var best = -1; var bKls = -1; var bCx = 0L; var bCy = 0L
            outIdx(b).foreach { ci =>
              val c = eTo(ci)
              val cxv = ux(c) - ux(b); val cyv = uy(c) - uy(b)
              val cr = dx * cyv - dy * cxv; val dt = dx * cxv + dy * cyv
              val kls = if (cr == 0L && dt < 0L) 3 else if (cr > 0L) 2
                        else if (cr == 0L) 1 else 0
              val take =
                if (best < 0) true
                else if (kls != bKls) kls > bKls
                else if (kls == 2 || kls == 0) (bCx * cyv - bCy * cxv) > 0L
                else false
              if (take) { best = ci; bKls = kls; bCx = cxv; bCy = cyv }
            }
            require(best >= 0, "contour ring trace: dangling edge")
            if (best == e0) closed = true
            else {
              require(!used(best), "contour ring trace: revisited edge (inconsistent pinch)")
              cur = best
            }
          }
          rings += verts.toArray
        }
        e0 += 1
      }
      // raw shoelace per ring — signed area in areaQ units exactly
      val areas = rings.map { vs =>
        var s = 0L; var i = 0; val n = vs.length
        while (i < n) {
          val a = vs(i); val b = vs((i + 1) % n)
          s += ux(a) * uy(b) - ux(b) * uy(a)
          i += 1
        }
        s
      }
      val shellIdx = rings.indices.filter(areas(_) > 0L).toArray
      val holeIdx = rings.indices.filter(areas(_) < 0L)
      // hole → smallest containing shell by exact even-odd PIP on the
      // ×2 lattice (rep point = first-edge midpoint), computed only when
      // the caller needs the nesting (WKB emission / the feature split) —
      // it is the one superlinear step of the layer build. Candidate
      // shells are pruned by a per-shell bbox test (x2 lattice units)
      // before the exact PIP, in ascending-area order so the first hit is
      // the smallest containing shell.
      def contains(ring: Array[Long], px2: Long, py2: Long): Boolean = {
        var inside = false; var i = 0; val n = ring.length
        while (i < n) {
          val x1 = 2L * ux(ring(i)); val y1 = 2L * uy(ring(i))
          val j = (i + 1) % n
          val x2 = 2L * ux(ring(j)); val y2 = 2L * uy(ring(j))
          if ((y1 > py2) != (y2 > py2)) {
            val num = (x1 - px2) * (y2 - y1) + (py2 - y1) * (x2 - x1)
            if ((num > 0L) == (y2 > y1)) inside = !inside
          }
          i += 1
        }
        inside
      }
      val holesOf: Map[Int, Array[Int]] =
        if (!needNesting || holeIdx.isEmpty) Map.empty
        else {
          val bySize = shellIdx.sortBy(areas(_))
          // per-shell bboxes in x2 lattice units, aligned with bySize
          val bb = bySize.map { sIx =>
            val r = rings(sIx)
            var mnx = Long.MaxValue; var mxx = Long.MinValue
            var mny = Long.MaxValue; var mxy = Long.MinValue
            var i = 0
            while (i < r.length) {
              val x = 2L * ux(r(i)); val y = 2L * uy(r(i))
              if (x < mnx) mnx = x; if (x > mxx) mxx = x
              if (y < mny) mny = y; if (y > mxy) mxy = y
              i += 1
            }
            (mnx, mxx, mny, mxy)
          }
          val acc = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
          holeIdx.foreach { hIx =>
            val r = rings(hIx)
            val mx = ux(r(0)) + ux(r(1 % r.length))
            val my = uy(r(0)) + uy(r(1 % r.length))
            var found = -1
            var k = 0
            while (found < 0 && k < bySize.length) {
              val (mnx, mxx, mny, mxy) = bb(k)
              if (mx > mnx && mx < mxx && my > mny && my < mxy &&
                  contains(rings(bySize(k)), mx, my)) found = bySize(k)
              k += 1
            }
            // a hole with no containing shell is a nesting bug — fail
            // loudly (like the dangling/revisited-edge requires) instead
            // of silently emitting WKB whose area diverges from areaQ
            require(found >= 0, "contour ring nesting: orphan hole")
            acc.getOrElseUpdate(found, mutable.ArrayBuffer.empty) += hIx
          }
          acc.view.mapValues(_.toArray).toMap
        }
      IntervalRings(iv, lo, hi, rings.toArray, areas.toArray, shellIdx,
        holeIdx.length, holesOf)
    }
  }

  /** Open-addressed primitive set of DIRECTED lattice edges with
    * exact-pair cancellation: `addOrCancel(a, b)` removes a live (b, a)
    * instead of inserting — shared piece borders annihilate, leaving the
    * region boundary. Linear probing with tombstones; no boxing (the hot
    * path of the corpus-scale ring query). Duplicate same-direction
    * edges cannot occur (two pieces with the region on the same side of
    * one segment would overlap), so insert never probes for equality. */
  private final class EdgeSet {
    private var cap = 1 << 12
    private var mask = cap - 1
    private var aK = new Array[Long](cap)
    private var bK = new Array[Long](cap)
    private var state = new Array[Byte](cap) // 0 empty, 1 live, 2 tombstone
    private var live = 0
    private var fill = 0

    @inline private def slotOf(a: Long, b: Long): Int = {
      var h = a * 0x9E3779B97F4A7C15L + b
      h ^= h >>> 32; h *= 0xff51afd7ed558ccdL; h ^= h >>> 32
      (h & mask).toInt
    }

    def addOrCancel(a: Long, b: Long): Unit = {
      // probe for the reverse edge first (tombstones are skipped, the
      // probe chain ends at the first EMPTY slot)
      var i = slotOf(b, a)
      while (state(i) != 0) {
        if (state(i) == 1 && aK(i) == b && bK(i) == a) {
          state(i) = 2; live -= 1; return
        }
        i = (i + 1) & mask
      }
      if ((fill + 1) * 2 > cap) grow()
      i = slotOf(a, b)
      while (state(i) == 1) i = (i + 1) & mask
      if (state(i) == 0) fill += 1
      aK(i) = a; bK(i) = b; state(i) = 1; live += 1
    }

    private def grow(): Unit = {
      val oa = aK; val ob = bK; val os = state; val oc = cap
      cap <<= 1; mask = cap - 1
      aK = new Array[Long](cap); bK = new Array[Long](cap); state = new Array[Byte](cap)
      fill = 0; live = 0
      var i = 0
      while (i < oc) {
        if (os(i) == 1) {
          var j = slotOf(oa(i), ob(i))
          while (state(j) == 1) j = (j + 1) & mask
          aK(j) = oa(i); bK(j) = ob(i); state(j) = 1; fill += 1; live += 1
        }
        i += 1
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) { if (state(i) == 1) f(aK(i), bK(i)); i += 1 }
    }
  }

  /** Walk one triangle's boundary collecting the convex band polygon
    * {lo <= v < hi} (vertices in band + quantized level crossings, in
    * boundary order); writes lattice coords into (outX, outY), returns
    * the deduplicated vertex count. */
  private def walkBand(va: Double, vb: Double, vc: Double,
                       ax: Long, ay: Long, bx: Long, by: Long,
                       lo: Double, hi: Double,
                       outX: Array[Double], outY: Array[Double]): Int = {
    val cxl = 1024L; val cyl = 1024L
    val vs = Array(va, vb, vc)
    val xs = Array(ax.toDouble, bx.toDouble, cxl.toDouble)
    val ys = Array(ay.toDouble, by.toDouble, cyl.toDouble)
    var n = 0
    @inline def push(x: Double, y: Double): Unit = {
      if (n == 0 || outX(n - 1) != x || outY(n - 1) != y) {
        outX(n) = x; outY(n) = y; n += 1
      }
    }
    var e = 0
    while (e < 3) {
      val i0 = e; val i1 = (e + 1) % 3
      val v0 = vs(i0); val v1 = vs(i1)
      if (v0 >= lo && v0 < hi) push(xs(i0), ys(i0))
      // crossings of lo/hi on this edge, ordered by fraction from i0.
      // VALUE-CANONICAL quantization: the crossing is always rounded from
      // the smaller-value endpoint, so the two triangles sharing an edge
      // place it on the SAME lattice point even at exact .5 rounding ties
      // (round(x) vs 1024-round(1024-x) differ only at ties; value order
      // is frame-independent where edge direction is not). Without this,
      // a tie-prone level (e.g. n + (2k+1)/2048) breaks directed-edge
      // cancellation in ringBands. Non-tie inputs are bit-identical to
      // the direction-computed form the closed-form areas mirror.
      var f1 = -1L; var f2 = -1L; var first = true
      @inline def cross(level: Double): Unit = {
        if (level.isInfinite) ()
        else if ((v0 >= level) != (v1 >= level)) {
          val f =
            if (v0 < v1) crossFq(v0, v1, level)
            else 1024L - crossFq(v1, v0, level)
          if (first) { f1 = f; first = false } else f2 = f
        }
      }
      cross(lo); cross(hi)
      if (f1 >= 0 && f2 >= 0 && f2 < f1) { val t = f1; f1 = f2; f2 = t }
      @inline def pushF(f: Long): Unit = {
        push(xs(i0) + f * (xs(i1) - xs(i0)) / 1024.0,
          ys(i0) + f * (ys(i1) - ys(i0)) / 1024.0)
      }
      if (f1 >= 0) pushF(f1)
      if (f2 >= 0) pushF(f2)
      e += 1
    }
    // drop a trailing duplicate of the first point
    while (n > 1 && outX(n - 1) == outX(0) && outY(n - 1) == outY(0)) n -= 1
    n
  }

  /** Chain segments into maximal polylines by matching quantized endpoints. */
  private def chain(segs: Seq[Seg]): Seq[Array[Double]] = {
    @inline def key(x: Double, y: Double): (Long, Long) =
      (math.round(x * 1048576.0), math.round(y * 1048576.0))
    // adjacency: endpoint key -> list of (segIdx, whichEnd)
    val adj = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[(Int, Boolean)]]
    segs.zipWithIndex.foreach { case (s, i) =>
      adj.getOrElseUpdate(key(s.x1, s.y1), mutable.ArrayBuffer.empty) += ((i, true))
      adj.getOrElseUpdate(key(s.x2, s.y2), mutable.ArrayBuffer.empty) += ((i, false))
    }
    val used = new Array[Boolean](segs.length)
    val out = mutable.ArrayBuffer.empty[Array[Double]]
    segs.indices.foreach { start =>
      if (!used(start)) {
        used(start) = true
        val s0 = segs(start)
        val pts = mutable.ArrayDeque[(Double, Double)]((s0.x1, s0.y1), (s0.x2, s0.y2))
        // extend forward from the tail, then backward from the head
        var extended = true
        while (extended) {
          extended = false
          val (tx, ty) = pts.last
          adj.getOrElse(key(tx, ty), Nil).find { case (i, _) => !used(i) } match {
            case Some((i, fromStart)) =>
              used(i) = true
              val s = segs(i)
              pts.append(if (fromStart) (s.x2, s.y2) else (s.x1, s.y1))
              extended = true
            case None =>
              val (hx, hy) = pts.head
              adj.getOrElse(key(hx, hy), Nil).find { case (i, _) => !used(i) } match {
                case Some((i, fromStart)) =>
                  used(i) = true
                  val s = segs(i)
                  pts.prepend(if (fromStart) (s.x2, s.y2) else (s.x1, s.y1))
                  extended = true
                case None =>
              }
          }
        }
        val arr = new Array[Double](pts.length * 2)
        pts.zipWithIndex.foreach { case ((x, y), i) => arr(2 * i) = x; arr(2 * i + 1) = y }
        out += arr
      }
    }
    out.toSeq
  }
}
