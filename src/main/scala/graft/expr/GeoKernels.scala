package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import graft.core._

/** JVM-static kernels invoked from generated code (whole-stage codegen
  * emits direct static calls into this object's forwarders — the Spark-4
  * equivalent of the reference's C pixel-function ABI,
  * frmts/vrt/pixelfunctions.cpp:4377). All ArrayData in/out so the
  * expressions stay allocation-lean.
  */
object GeoKernels {

  /** Envelope of WKB geometry as array<double>[minx,miny,maxx,maxy]. */
  def wkbEnvelope(wkb: Array[Byte]): ArrayData = {
    val (minx, miny, maxx, maxy) = Wkb.envelope(wkb)
    new GenericArrayData(Array(minx, miny, maxx, maxy))
  }

  /** Exact polygon×envelope intersection test (filter-refine refine step,
    * reference contract ogrlayer.cpp:4004-4072). */
  def intersectsEnv(wkb: Array[Byte], env: ArrayData): Boolean =
    Pip.polygonIntersectsBox(wkb, env.getDouble(0), env.getDouble(1), env.getDouble(2), env.getDouble(3))

  /** Covering cells of an envelope at an adaptive level ≤ finest such that
    * ≤ maxCells cells are produced (bounds the explode factor for huge
    * geometries — the skew guard of SURVEY.md §4). */
  def cellsCovering(env: ArrayData, finest: Int, maxCells: Int): ArrayData = {
    val minx = env.getDouble(0); val miny = env.getDouble(1)
    val maxx = env.getDouble(2); val maxy = env.getDouble(3)
    val lvl = CellIndex.adaptiveLevel(minx, miny, maxx, maxy, finest, maxCells)
    new GenericArrayData(CellIndex.cover(minx, miny, maxx, maxy, lvl))
  }

  /** Covering cells at one fixed level (join-key side must agree on level). */
  def cellsCoveringAt(env: ArrayData, level: Int): ArrayData = {
    new GenericArrayData(CellIndex.cover(env.getDouble(0), env.getDouble(1), env.getDouble(2), env.getDouble(3), level))
  }

  /** Lon/lat envelope → packed WebMercator tile ids for zooms [zmin, zmax]. */
  def tileCover(env: ArrayData, zmin: Int, zmax: Int): ArrayData = {
    val minLon = env.getDouble(0); val minLat = env.getDouble(1)
    val maxLon = env.getDouble(2); val maxLat = env.getDouble(3)
    val mx0 = Mercator.x(minLon); val mx1 = Mercator.x(maxLon)
    val my0 = Mercator.y(Mercator.clampLat(minLat)); val my1 = Mercator.y(Mercator.clampLat(maxLat))
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var z = zmin
    while (z <= zmax) {
      val (tx0, ty0, tx1, ty1) = TileMath.tileRange(mx0, my0, mx1, my1, z)
      var x = tx0
      while (x <= tx1) {
        var y = ty0
        while (y <= ty1) { buf += TileMath.pack(z, x, y); y += 1 }
        x += 1
      }
      z += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Footprint: (gt[6], w, h, srid) → lon/lat envelope array<double>[4].
    * For srid=4326 the affine envelope IS the lon/lat envelope (corners
    * suffice). For projected srids, constant-northing edges CURVE in
    * lat/lon (max lat occurs mid-edge near the zone's central meridian),
    * so the boundary is sampled at 8 steps per edge before transforming —
    * the GDALSuggestedWarpOutput2 edge-walk (alg/gdaltransformer.cpp:851). */
  def footprint(gt: ArrayData, w: Int, h: Int, srid: Int): ArrayData = {
    val g = gt.toDoubleArray()
    val (minx, miny, maxx, maxy) = GeoTransform.envelope(g, w, h)
    if (srid == 4326) new GenericArrayData(Array(minx, miny, maxx, maxy))
    else {
      val steps = 8
      var minLon = Double.MaxValue; var minLat = Double.MaxValue
      var maxLon = -Double.MaxValue; var maxLat = -Double.MaxValue
      @inline def sample(x: Double, y: Double): Unit = {
        val (lon, lat) = CrsTransform.toLonLat(srid, x, y)
        if (lon < minLon) minLon = lon
        if (lon > maxLon) maxLon = lon
        if (lat < minLat) minLat = lat
        if (lat > maxLat) maxLat = lat
      }
      var i = 0
      while (i <= steps) {
        val t = i.toDouble / steps
        val x = minx + t * (maxx - minx)
        val y = miny + t * (maxy - miny)
        sample(x, miny); sample(x, maxy) // south + north edges
        sample(minx, y); sample(maxx, y) // west + east edges
        i += 1
      }
      new GenericArrayData(Array(minLon, minLat, maxLon, maxLat))
    }
  }

  /** Per-band GDAL checksums of an encoded image. */
  def checksumBands(bytes: Array[Byte], fmt: String, w: Int, h: Int): ArrayData = {
    val r = ImageCodec.decode(bytes, fmt.toString, w, h)
    new GenericArrayData(r.bands.map(b => GdalChecksum.ofInts(b, r.w, r.h)))
  }

  /** Fused decode→stats: [nbands, min, max, mean, checksum_b0]. */
  def imageStats(bytes: Array[Byte], fmt: String, w: Int, h: Int): ArrayData = {
    val r = ImageCodec.decode(bytes, fmt, w, h)
    val b0 = r.bands(0)
    var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
    var i = 0
    while (i < b0.length) {
      val v = b0(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v
      i += 1
    }
    new GenericArrayData(Array[Double](r.nBands, mn, mx, sum.toDouble / b0.length,
      GdalChecksum.ofInts(b0, r.w, r.h)))
  }

  /** 64-bit average-hash perceptual fingerprint of the decoded image:
    * 8×8 box-average of band 0, bit set where pixel > mean. */
  def phash64(bytes: Array[Byte], fmt: String, w: Int, h: Int): Long = {
    val r = ImageCodec.decode(bytes, fmt, w, h)
    phashOfRaster(r)
  }

  def phashOfRaster(r: Raster): Long = {
    val b = r.bands(0)
    // cell i holds the exact rational average s(i)/n(i); the bit test
    // `cell > mean` is evaluated in exact integer arithmetic (cross-
    // multiplication over the lcm of the block sizes) so the hash is
    // platform-deterministic and re-derivable by a SQL oracle — no
    // float-rounding tie behavior.
    val ss = new Array[Long](64)
    val ns = new Array[Long](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val x0 = gx * r.w / 8; val x1 = math.max(x0 + 1, (gx + 1) * r.w / 8)
        val y0 = gy * r.h / 8; val y1 = math.max(y0 + 1, (gy + 1) * r.h / 8)
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += b(y * r.w + x); n += 1; x += 1 }
          y += 1
        }
        ss(gy * 8 + gx) = s; ns(gy * 8 + gx) = n
        gx += 1
      }
      gy += 1
    }
    // D = lcm of block pixel-counts; T = sum_j s_j * (D / n_j), so
    // mean = T / (64 D) and (s_i / n_i > mean) <=> (64 D s_i > T n_i).
    var d = BigInt(1)
    var i = 0
    while (i < 64) { val n = BigInt(ns(i)); d = d / d.gcd(n) * n; i += 1 }
    var t = BigInt(0)
    i = 0
    while (i < 64) { t += BigInt(ss(i)) * (d / BigInt(ns(i))); i += 1 }
    val d64 = d * 64
    var bits = 0L
    i = 0
    while (i < 64) {
      if (BigInt(ss(i)) * d64 > t * BigInt(ns(i))) bits |= (1L << i)
      i += 1
    }
    bits
  }
}
