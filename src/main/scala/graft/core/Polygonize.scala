package graft.core

import scala.collection.mutable

/** Raster→vector: connected-component regions → polygons with holes.
  *
  * Same contract as the reference's polygonizer (alg/polygonize.cpp
  * GDALPolygonizeT two-row sweep + alg/polygonize_polygonizer.cpp assembly;
  * 4/8-connectedness switch at :87): every maximal connected region of
  * equal-valued pixels becomes one polygon whose outer ring and holes trace
  * the pixel-edge boundary. Implementation here is union-find labeling +
  * boundary-edge chaining (interior kept on the left), written fresh.
  * Images are independent rows in the corpus, so this runs per-row with no
  * cross-image stitching (SURVEY.md §2.8).
  */
object Polygonize {
  final case class Region(value: Int, pixelCount: Int, wkb: Array[Byte])

  def polygonize(grid: Array[Int], w: Int, h: Int, gt: Array[Double],
                 connect8: Boolean = false, skipValue: Option[Int] = None): Seq[Region] = {
    val n = w * h
    val parent = Array.tabulate(n)(identity)
    def find(a: Int): Int = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val v = grid(i)
        if (x + 1 < w && grid(i + 1) == v) union(i, i + 1)
        if (y + 1 < h) {
          if (grid(i + w) == v) union(i, i + w)
          if (connect8) {
            if (x + 1 < w && grid(i + w + 1) == v) union(i, i + w + 1)
            if (x > 0 && grid(i + w - 1) == v) union(i, i + w - 1)
          }
        }
        x += 1
      }
      y += 1
    }

    // boundary edges per component, encoded (fromVertex, toVertex) with
    // vertex id = vy*(w+1)+vx; direction keeps interior on the left
    val edges = mutable.HashMap.empty[Int, mutable.HashMap[Int, mutable.ArrayBuffer[Int]]]
    val counts = mutable.HashMap.empty[Int, Int]
    @inline def vid(vx: Int, vy: Int): Int = vy * (w + 1) + vx
    @inline def addEdge(comp: Int, from: Int, to: Int): Unit =
      edges.getOrElseUpdate(comp, mutable.HashMap.empty)
        .getOrElseUpdate(from, mutable.ArrayBuffer.empty) += to
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val comp = find(i)
        counts.update(comp, counts.getOrElse(comp, 0) + 1)
        val v = grid(i)
        // top: neighbor differs → edge (x+1,y)→(x,y)
        if (y == 0 || grid(i - w) != v) addEdge(comp, vid(x + 1, y), vid(x, y))
        // bottom: edge (x,y+1)→(x+1,y+1)
        if (y == h - 1 || grid(i + w) != v) addEdge(comp, vid(x, y + 1), vid(x + 1, y + 1))
        // left: edge (x,y)→(x,y+1)
        if (x == 0 || grid(i - 1) != v) addEdge(comp, vid(x, y), vid(x, y + 1))
        // right: edge (x+1,y+1)→(x+1,y)
        if (x == w - 1 || grid(i + 1) != v) addEdge(comp, vid(x + 1, y + 1), vid(x + 1, y))
        x += 1
      }
      y += 1
    }

    val out = mutable.ArrayBuffer.empty[Region]
    edges.toSeq.sortBy(_._1).foreach { case (comp, adj) =>
      val v = grid(comp)
      if (!skipValue.contains(v)) {
        val loops = chainLoops(adj, w, connect8)
        if (loops.nonEmpty) {
          // outer ring = max |signed area|; rest are holes
          val withArea = loops.map(l => (l, math.abs(signedArea(l, w + 1))))
          val outer = withArea.maxBy(_._2)._1
          val holes = withArea.filter(_._1 ne outer).map(_._1)
          val rings = (outer +: holes).map(ring => toGeo(ring, gt, w))
          out += Region(v, counts(comp), Wkb.writePolygon(rings.toArray))
        }
      }
    }
    out.toSeq
  }

  /** Chain directed edges into closed loops. At a 2-way junction
    * (checkerboard vertex) prefer the turn that keeps diagonal cells
    * separate (4-conn: right turn) or merged (8-conn: left turn). */
  private def chainLoops(adj: mutable.HashMap[Int, mutable.ArrayBuffer[Int]],
                         w: Int, connect8: Boolean): Seq[Array[Int]] = {
    val loops = mutable.ArrayBuffer.empty[Array[Int]]
    val stride = w + 1
    while (adj.nonEmpty) {
      val start = adj.keysIterator.min
      val loop = mutable.ArrayBuffer.empty[Int]
      var cur = start
      var prev = -1
      var continue = true
      while (continue) {
        val outs = adj.getOrElse(cur, null)
        if (outs == null || outs.isEmpty) {
          continue = false // degenerate; shouldn't happen on well-formed grids
        } else {
          val next =
            if (outs.length == 1 || prev == -1) outs.head
            else {
              // pick by turn direction relative to incoming edge
              val dinX = (cur % stride) - (prev % stride)
              val dinY = (cur / stride) - (prev / stride)
              def cross(to: Int): Int = {
                val dx = (to % stride) - (cur % stride)
                val dy = (to / stride) - (cur / stride)
                dinX * dy - dinY * dx // screen coords: >0 = right turn
              }
              if (connect8) outs.minBy(cross) else outs.maxBy(cross)
            }
          outs -= next
          if (outs.isEmpty) adj.remove(cur)
          loop += cur
          prev = cur
          cur = next
          if (cur == start) {
            loop += cur
            loops += simplifyCollinear(loop.toArray, stride)
            continue = false
          }
        }
      }
    }
    loops.toSeq
  }

  /** Drop intermediate vertices on straight runs of unit edges. */
  private def simplifyCollinear(loop: Array[Int], stride: Int): Array[Int] = {
    if (loop.length < 4) return loop
    val keep = mutable.ArrayBuffer.empty[Int]
    val m = loop.length - 1 // last == first
    var i = 0
    while (i < m) {
      val p = loop((i - 1 + m) % m)
      val c = loop(i)
      val nx = loop((i + 1) % m)
      val d1x = (c % stride) - (p % stride); val d1y = (c / stride) - (p / stride)
      val d2x = (nx % stride) - (c % stride); val d2y = (nx / stride) - (c / stride)
      if (d1x * d2y - d1y * d2x != 0) keep += c
      i += 1
    }
    if (keep.isEmpty) return loop
    keep += keep.head
    keep.toArray
  }

  private def signedArea(loop: Array[Int], stride: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i + 1 < loop.length) {
      val x1 = (loop(i) % stride).toDouble; val y1 = (loop(i) / stride).toDouble
      val x2 = (loop(i + 1) % stride).toDouble; val y2 = (loop(i + 1) / stride).toDouble
      acc += x1 * y2 - x2 * y1
      i += 1
    }
    acc / 2.0
  }

  private def toGeo(loop: Array[Int], gt: Array[Double], w: Int): Array[Double] = {
    val stride = w + 1
    val out = new Array[Double](loop.length * 2)
    var i = 0
    while (i < loop.length) {
      val vx = loop(i) % stride
      val vy = loop(i) / stride
      out(2 * i) = GeoTransform.applyX(gt, vx, vy)
      out(2 * i + 1) = GeoTransform.applyY(gt, vx, vy)
      i += 1
    }
    out
  }
}
