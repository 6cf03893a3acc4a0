package graft.core

/** Raster morphology family (SURVEY.md §2.8 optional rows, now included):
  *  - sieve: remove connected components below a size threshold, merging
  *    each into its largest neighbour (alg/gdalsievefilter.cpp:178
  *    semantics incl. the merge-chain resolution of :39-49);
  *  - proximity: distance to the nearest target pixel
  *    (alg/gdalproximity.cpp:94's purpose; computed here as an EXACT
  *    euclidean distance transform via the separable parabolic-envelope
  *    method — published Felzenszwalb/Huttenlocher EDT);
  *  - fillNodata: IDW fill of nodata pixels from the nearest valid pixel
  *    along 8 search rays (alg/rasterfill.cpp's 4/8-direction search +
  *    inverse-distance weighting, without the smoothing iterations).
  */
object Morph {

  /** Connected-component labels (row-major first-seen ids from 0) and
    * sizes. connect8 adds the two diagonal adjacencies. */
  def label(band: Array[Int], w: Int, h: Int, connect8: Boolean): (Array[Int], Array[Int]) = {
    val parent = Array.tabulate(w * h)(identity)
    def find(a0: Int): Int = {
      var a = a0
      while (parent(a) != a) { parent(a) = parent(parent(a)); a = parent(a) }
      a
    }
    @inline def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val v = band(i)
        if (x > 0 && band(i - 1) == v) union(i, i - 1)
        if (y > 0 && band(i - w) == v) union(i, i - w)
        if (connect8 && y > 0) {
          if (x > 0 && band(i - w - 1) == v) union(i, i - w - 1)
          if (x < w - 1 && band(i - w + 1) == v) union(i, i - w + 1)
        }
        x += 1
      }
      y += 1
    }
    val ids = new java.util.HashMap[Integer, Integer]()
    val labels = new Array[Int](w * h)
    var next = 0
    var i = 0
    while (i < w * h) {
      val r = find(i)
      var id = ids.get(r)
      if (id == null) { id = next; ids.put(r, next); next += 1 }
      labels(i) = id
      i += 1
    }
    val sizes = new Array[Int](next)
    i = 0
    while (i < w * h) { sizes(labels(i)) += 1; i += 1 }
    (labels, sizes)
  }

  /** Sieve filter: returns a NEW band where components smaller than
    * `threshold` take the value of their largest neighbour (chains of
    * small neighbours resolve to the first large component, cycle-safe). */
  def sieve(band: Array[Int], w: Int, h: Int, threshold: Int, connect8: Boolean): Array[Int] = {
    val (labels, sizes) = label(band, w, h, connect8)
    val n = sizes.length
    // largest neighbour per small component
    val bestNbSize = new Array[Int](n)
    val bestNb = Array.fill(n)(-1)
    @inline def consider(a: Int, b: Int): Unit = {
      if (a != b) {
        if (sizes(b) > bestNbSize(a)) { bestNbSize(a) = sizes(b); bestNb(a) = b }
        if (sizes(a) > bestNbSize(b)) { bestNbSize(b) = sizes(a); bestNb(b) = a }
      }
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (x < w - 1) consider(labels(i), labels(i + 1))
        if (y < h - 1) consider(labels(i), labels(i + w))
        if (connect8 && y < h - 1) {
          if (x > 0) consider(labels(i), labels(i + w - 1))
          if (x < w - 1) consider(labels(i), labels(i + w + 1))
        }
        x += 1
      }
      y += 1
    }
    // resolve merge target: follow small→largest-neighbour chains
    val target = Array.tabulate(n)(identity)
    var c = 0
    while (c < n) {
      if (sizes(c) < threshold && bestNb(c) >= 0) {
        var t = bestNb(c)
        val seen = scala.collection.mutable.Set(c)
        while (sizes(t) < threshold && bestNb(t) >= 0 && !seen.contains(t)) {
          seen += t
          t = bestNb(t)
        }
        target(c) = t
      }
      c += 1
    }
    // representative value per component = value of any member pixel
    val compValue = new Array[Int](n)
    var i = 0
    while (i < w * h) { compValue(labels(i)) = band(i); i += 1 }
    val out = new Array[Int](w * h)
    i = 0
    while (i < w * h) {
      out(i) = compValue(target(labels(i)))
      i += 1
    }
    out
  }

  /** Exact squared euclidean distance transform: d2(i) = min over target
    * pixels t of |i − t|² (in pixels). `isTarget(v)` selects targets. */
  def edt2(band: Array[Int], w: Int, h: Int, isTarget: Int => Boolean): Array[Double] = {
    val Inf = 1e18
    val f = new Array[Double](math.max(w, h))
    val d = new Array[Double](math.max(w, h))
    val vIdx = new Array[Int](math.max(w, h))
    val z = new Array[Double](math.max(w, h) + 1)

    def dt1d(n: Int): Unit = {
      var k = 0
      vIdx(0) = 0
      z(0) = -Inf
      z(1) = Inf
      var q = 1
      while (q < n) {
        var s = 0.0
        var cont = true
        while (cont) {
          s = ((f(q) + q * q) - (f(vIdx(k)) + vIdx(k) * vIdx(k))) / (2.0 * q - 2.0 * vIdx(k))
          if (s <= z(k)) k -= 1 else cont = false
        }
        k += 1
        vIdx(k) = q
        z(k) = s
        z(k + 1) = Inf
        q += 1
      }
      k = 0
      q = 0
      while (q < n) {
        while (z(k + 1) < q) k += 1
        d(q) = (q - vIdx(k)) * (q - vIdx(k)) + f(vIdx(k))
        q += 1
      }
    }

    val g = new Array[Double](w * h)
    // columns pass
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { f(y) = if (isTarget(band(y * w + x))) 0.0 else Inf; y += 1 }
      dt1d(h)
      y = 0
      while (y < h) { g(y * w + x) = d(y); y += 1 }
      x += 1
    }
    // rows pass
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < w) { f(i) = g(y * w + i); i += 1 }
      dt1d(w)
      i = 0
      while (i < w) { out(y * w + i) = d(i); i += 1 }
      y += 1
    }
    out
  }

  /** Fill nodata pixels with the inverse-distance-weighted mean of the
    * first valid pixel found along each of the 8 rays, searching at most
    * `maxDist` steps. Pixels with no valid ray stay nodata. */
  def fillNodata(band: Array[Int], w: Int, h: Int, nodata: Int, maxDist: Int): Array[Int] =
    fillNodataWithCount(band, w, h, nodata, maxDist)._1

  /** fillNodata plus the count of UNFILLABLE pixels (no valid ray). GDAL
    * tracks fill success in the mask band (alg/rasterfill.cpp), so a pixel
    * whose IDW value happens to round to the nodata marker still counts as
    * filled — remaining-nodata must be the no-valid-ray count, not a
    * value==nodata scan. */
  def fillNodataWithCount(band: Array[Int], w: Int, h: Int, nodata: Int,
                          maxDist: Int): (Array[Int], Int) = {
    val out = band.clone()
    var unfilled = 0
    val dirs = Array((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (band(y * w + x) == nodata) {
          var num = 0.0
          var den = 0.0
          dirs.foreach { case (dx, dy) =>
            var k = 1
            var found = false
            while (k <= maxDist && !found) {
              val nx = x + dx * k
              val ny = y + dy * k
              if (nx < 0 || nx >= w || ny < 0 || ny >= h) found = true // ray exits
              else if (band(ny * w + nx) != nodata) {
                val dist = math.sqrt((dx * dx + dy * dy).toDouble) * k
                num += band(ny * w + nx) / dist
                den += 1.0 / dist
                found = true
              }
              k += 1
            }
          }
          if (den > 0) out(y * w + x) = math.floor(num / den + 0.5).toInt
          else unfilled += 1
        }
        x += 1
      }
      y += 1
    }
    (out, unfilled)
  }
}
