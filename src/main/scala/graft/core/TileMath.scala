package graft.core

/** WebMercatorQuad XYZ tile math.
  *
  * Semantics verified against the reference (behavior only, no code reuse):
  *  - tile-range-from-extent: floor((coord − origin)/tileSpan + 1e-3) clamped
  *    to the matrix, per apps/gdalalg_raster_tile.cpp:435-504 GetTileIndices.
  *  - resolution ladder: initial = 2π·6378137/256, res(z) = initial/2^z, per
  *    gdal2tiles.py GlobalMercator (:418, :498-502).
  *  - xyz vs tms: fileY = xyz ? y : 2^z−1−y, per gdalalg_raster_tile.cpp:509.
  *  - quadkey: per-level digit = colBit | rowBit<<1, MSB first, per
  *    frmts/wms/minidriver_virtualearth.cpp:72-83 (Bing convention).
  */
object TileMath {
  val TileSize: Int = 256
  val OriginX: Double = -Mercator.HalfWorld
  val OriginY: Double = Mercator.HalfWorld // top-left origin (XYZ)
  val InitialResolution: Double = 2.0 * math.Pi * Mercator.R / TileSize
  private val Epsilon = 1e-3

  @inline def matrixSize(z: Int): Int = 1 << z

  @inline def resolution(z: Int): Double = InitialResolution / matrixSize(z)

  /** Span of one tile in meters at zoom z. */
  @inline def tileSpan(z: Int): Double = resolution(z) * TileSize

  @inline private def clampIdx(v: Double, z: Int): Int = {
    val m = matrixSize(z) - 1
    math.max(0.0, math.min(math.floor(v + Epsilon), m.toDouble)).toInt
  }

  /** Tile x for a 3857 x-coordinate (GetTileIndices floor+ε semantics). */
  @inline def tileX(mx: Double, z: Int): Int =
    clampIdx((mx - OriginX) / tileSpan(z), z)

  /** Tile y (XYZ, row 0 at top) for a 3857 y-coordinate. */
  @inline def tileY(my: Double, z: Int): Int =
    clampIdx((OriginY - my) / tileSpan(z), z)

  /** Inclusive tile index range covering a 3857 extent at zoom z:
    * (minTx, minTy, maxTx, maxTy) in XYZ convention. */
  def tileRange(minx: Double, miny: Double, maxx: Double, maxy: Double, z: Int): (Int, Int, Int, Int) =
    (tileX(minx, z), tileY(maxy, z), tileX(maxx, z), tileY(miny, z))

  /** 3857 bounds of tile (z,x,y) XYZ: (minx, miny, maxx, maxy). */
  def tileBounds(z: Int, x: Int, y: Int): (Double, Double, Double, Double) = {
    val span = tileSpan(z)
    (OriginX + x * span, OriginY - (y + 1) * span, OriginX + (x + 1) * span, OriginY - y * span)
  }

  /** Geotransform of a tile rendered at TileSize px. */
  def tileGeoTransform(z: Int, x: Int, y: Int): Array[Double] = {
    val res = resolution(z)
    val (minx, _, _, maxy) = tileBounds(z, x, y)
    Array(minx, res, 0.0, maxy, 0.0, -res)
  }

  /** XYZ → TMS (or back — it's an involution) row flip. */
  @inline def flipY(z: Int, y: Int): Int = matrixSize(z) - 1 - y

  /** Bing quadkey string for XYZ tile. */
  def quadkey(z: Int, x: Int, y: Int): String = {
    val sb = new java.lang.StringBuilder(z)
    var i = z
    while (i > 0) {
      val mask = 1 << (i - 1)
      var d = 0
      if ((x & mask) != 0) d |= 1
      if ((y & mask) != 0) d |= 2
      sb.append(('0' + d).toChar)
      i -= 1
    }
    sb.toString
  }

  def quadkeyToTile(qk: String): (Int, Int, Int) = {
    var x = 0; var y = 0
    qk.foreach { c =>
      val d = c - '0'
      x = (x << 1) | (d & 1)
      y = (y << 1) | ((d >> 1) & 1)
    }
    (qk.length, x, y)
  }

  /** Pack (z,x,y) into one long join key: z in the top 6 bits, then x, y
    * (29 bits each — supports z ≤ 28). Monotone in (z, x, y). */
  @inline def pack(z: Int, x: Int, y: Int): Long =
    (z.toLong << 58) | (x.toLong << 29) | y.toLong

  @inline def unpackZ(t: Long): Int = (t >>> 58).toInt
  @inline def unpackX(t: Long): Int = ((t >>> 29) & 0x1FFFFFFFL).toInt
  @inline def unpackY(t: Long): Int = (t & 0x1FFFFFFFL).toInt

  /** Morton (Z-order) interleave of x,y — used for locality-preserving
    * range partitioning (Hilbert-like ordering; the reference uses a true
    * Hilbert curve in apps/gdalalg_vector_sort.cpp:40 — Z-order has the
    * same clustering role and is cheaper). */
  def morton(x: Int, y: Int): Long = {
    @inline def spread(v: Int): Long = {
      var n = v.toLong & 0xFFFFFFFFL
      n = (n | (n << 16)) & 0x0000FFFF0000FFFFL
      n = (n | (n << 8)) & 0x00FF00FF00FF00FFL
      n = (n | (n << 4)) & 0x0F0F0F0F0F0F0F0FL
      n = (n | (n << 2)) & 0x3333333333333333L
      n = (n | (n << 1)) & 0x5555555555555555L
      n
    }
    (spread(y) << 1) | spread(x)
  }
}
