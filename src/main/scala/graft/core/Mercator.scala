package graft.core

/** EPSG:4326 ↔ EPSG:3857 (spherical web Mercator).
  *
  * Formulas match the canonical WebMercatorQuad math used by the reference's
  * tiling (swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:316-518
  * GlobalMercator, apps/gdalalg_raster_tile.cpp) but are written from the
  * published spherical-Mercator equations — no code is translated.
  *
  * NOTE on op order: the oracle SQL in SparkEntry recomputes these values in
  * DuckDB; keep the exact sequence of IEEE ops here in sync with those SQL
  * strings so results are bit-identical (basic ops are exactly specified).
  */
object Mercator {
  val R: Double = 6378137.0
  /** half circumference = π·R — the 3857 world half-extent. */
  val HalfWorld: Double = R * math.Pi // 20037508.342789244
  val MaxLat: Double = 85.05112878 // atan(sinh(π)) in degrees, tile-scheme clamp
  private val DegToMerc = R * math.Pi / 180.0 // lon degrees → meters

  @inline def clampLat(lat: Double): Double =
    math.max(-MaxLat, math.min(MaxLat, lat))

  /** lon/lat (deg, EPSG:4326) → x meters (EPSG:3857). */
  @inline def x(lon: Double): Double = lon * DegToMerc

  /** lat deg → y meters; caller clamps to ±MaxLat for tile math. */
  @inline def y(lat: Double): Double = {
    val latRad = lat * (math.Pi / 180.0)
    R * math.log(math.tan((math.Pi / 4.0) + latRad / 2.0))
  }

  @inline def lon(mx: Double): Double = mx / DegToMerc

  @inline def lat(my: Double): Double =
    (2.0 * math.atan(math.exp(my / R)) - math.Pi / 2.0) * (180.0 / math.Pi)
}
