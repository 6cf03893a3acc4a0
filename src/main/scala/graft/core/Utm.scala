package graft.core

/** WGS84 ↔ UTM (EPSG:326xx north / 327xx south) via the standard
  * Karney–Krüger transverse-Mercator series (public formulas, order n³ —
  * sub-mm inside a zone). Replaces the reference's PROJ dependency
  * (ogr/ogrct.cpp:1793 proj_create_crs_to_crs) for the corpus's three CRS
  * families, per SURVEY.md §1.2.
  */
object Utm {
  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val k0 = 0.9996
  private val E0 = 500000.0
  private val n = f / (2.0 - f)
  private val n2 = n * n
  private val n3 = n2 * n
  private val A = a / (1.0 + n) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0)
  private val alpha = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0,
    13.0 * n2 / 48.0 - 3.0 * n3 / 5.0,
    61.0 * n3 / 240.0)
  private val beta = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0,
    n2 / 48.0 + n3 / 15.0,
    17.0 * n3 / 480.0)
  private val delta = Array(
    2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3,
    7.0 * n2 / 3.0 - 8.0 * n3 / 5.0,
    56.0 * n3 / 15.0)

  /** Series constants exposed so the oracle SQL is GENERATED from the
    * same values (structural parity with `inverse`). */
  private[graft] def kA: Double = k0 * A
  private[graft] def betaCoeffs: Array[Double] = beta
  private[graft] def deltaCoeffs: Array[Double] = delta

  @inline def zoneOf(srid: Int): Int = srid % 100
  @inline def isNorth(srid: Int): Boolean = srid / 100 == 326
  @inline def isUtm(srid: Int): Boolean = { val p = srid / 100; p == 326 || p == 327 }
  @inline private def lon0(zone: Int): Double = (zone * 6 - 183).toDouble

  /** lon/lat degrees → (easting, northing) meters. */
  def forward(srid: Int, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lam = math.toRadians(lonDeg - lon0(zoneOf(srid)))
    val phi = math.toRadians(latDeg)
    val sinPhi = math.sin(phi)
    val tConf = {
      val s = 2.0 * math.sqrt(n) / (1.0 + n)
      math.sinh(atanh(sinPhi) - s * atanh(s * sinPhi))
    }
    val cosLam = math.cos(lam)
    val xiP = math.atan2(tConf, cosLam)
    val etaP = asinh(math.sin(lam) / math.sqrt(tConf * tConf + cosLam * cosLam))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 3) {
      xi += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    val e = E0 + k0 * A * eta
    val nn = k0 * A * xi + (if (isNorth(srid)) 0.0 else 10000000.0)
    (e, nn)
  }

  /** (easting, northing) meters → lon/lat degrees. */
  def inverse(srid: Int, easting: Double, northing: Double): (Double, Double) = {
    val nAdj = northing - (if (isNorth(srid)) 0.0 else 10000000.0)
    val xi = nAdj / (k0 * A)
    val eta = (easting - E0) / (k0 * A)
    var xiP = xi
    var etaP = eta
    var j = 1
    while (j <= 3) {
      xiP -= beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
      etaP -= beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var phi = chi
    j = 1
    while (j <= 3) {
      phi += delta(j - 1) * math.sin(2.0 * j * chi)
      j += 1
    }
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    (lon0(zoneOf(srid)) + math.toDegrees(lam), math.toDegrees(phi))
  }

  @inline private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  @inline private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))
}

/** srid-dispatched coordinate transform: supports 4326, 3857, UTM 326xx/327xx. */
object CrsTransform {
  /** (x,y) in `from` srid → (x,y) in `to` srid, routed through lon/lat. */
  def transform(from: Int, to: Int, x: Double, y: Double): (Double, Double) = {
    if (from == to) return (x, y)
    val (lon, lat) = toLonLat(from, x, y)
    fromLonLat(to, lon, lat)
  }

  def toLonLat(srid: Int, x: Double, y: Double): (Double, Double) = srid match {
    case 4326 => (x, y)
    case 3857 => (Mercator.lon(x), Mercator.lat(y))
    case s if Utm.isUtm(s) => Utm.inverse(s, x, y)
    case s => throw new IllegalArgumentException(s"unsupported srid $s")
  }

  def fromLonLat(srid: Int, lon: Double, lat: Double): (Double, Double) = srid match {
    case 4326 => (lon, lat)
    case 3857 => (Mercator.x(lon), Mercator.y(lat))
    case s if Utm.isUtm(s) => Utm.forward(s, lon, lat)
    case s => throw new IllegalArgumentException(s"unsupported srid $s")
  }
}
