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
