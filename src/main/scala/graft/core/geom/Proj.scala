package graft.core.geom

/**
 * SWEREF99 TM (EPSG:3006) <-> WGS84 (EPSG:4326) <-> Web Mercator (EPSG:3857)
 * and slippy-map tile arithmetic.
 *
 * The reference stores everything in 3006 and transforms 3006->3857 for MVT
 * tiles (/root/reference/database/migrations/12-v-deviation_preschools_scb.sql:84)
 * and 3006->4326 for GPX/osmChange exports (11-api-gpx.sql:14, 19-osmChange.sql:63).
 *
 * Implementation: standard Transverse Mercator with the Krüger-series
 * expansion (as published in the PROJ / Karney literature), GRS80 ellipsoid,
 * lon0 = 15°E, k0 = 0.9996, false easting 500 000 m. Accuracy within Sweden
 * is sub-millimeter, far below any tile-assignment tolerance.
 */
object Proj {
  // GRS80
  private val a = 6378137.0
  private val f = 1.0 / 298.257222101
  private val k0 = 0.9996
  private val lon0 = math.toRadians(15.0)
  private val FE = 500000.0
  private val FN = 0.0

  private val n = f / (2 - f)
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  // rectifying radius
  private val A1 = a / (1 + n) * (1 + n2 / 4 + n4 / 64)
  // forward coefficients (alpha) and reverse (beta), Krüger series to n^4
  private val alpha = Array(
    n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4,
    13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4,
    61.0 / 240 * n3 - 103.0 / 140 * n4,
    49561.0 / 161280 * n4)
  private val beta = Array(
    n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4,
    n2 / 48 + n3 / 15 - 437.0 / 1440 * n4,
    17.0 / 480 * n3 - 37.0 / 840 * n4,
    4397.0 / 161280 * n4)
  private val delta = Array(
    2 * n - 2.0 / 3 * n2 - 2 * n3 + 116.0 / 45 * n4,
    7.0 / 3 * n2 - 8.0 / 5 * n3 - 227.0 / 45 * n4,
    56.0 / 15 * n3 - 136.0 / 35 * n4,
    4279.0 / 630 * n4)

  private val e2 = f * (2 - f)
  private val e = math.sqrt(e2)

  /** lon/lat (degrees) -> EPSG:3006 easting/northing (meters). */
  def wgs84ToSweref(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg) - lon0
    // conformal latitude
    val t = math.sinh(atanh(math.sin(lat)) - e * atanh(e * math.sin(lat)))
    val xiP = math.atan2(t, math.cos(lon))
    val etaP = asinh(math.sin(lon) / math.hypot(t, math.cos(lon)))
    var xi = xiP; var eta = etaP
    var j = 0
    while (j < 4) {
      xi += alpha(j) * math.sin(2 * (j + 1) * xiP) * math.cosh(2 * (j + 1) * etaP)
      eta += alpha(j) * math.cos(2 * (j + 1) * xiP) * math.sinh(2 * (j + 1) * etaP)
      j += 1
    }
    (FE + k0 * A1 * eta, FN + k0 * A1 * xi)
  }

  /** EPSG:3006 easting/northing (meters) -> lon/lat (degrees). */
  def swerefToWgs84(x: Double, y: Double): (Double, Double) = {
    val xi = (y - FN) / (k0 * A1)
    val eta = (x - FE) / (k0 * A1)
    var xiP = xi; var etaP = eta
    var j = 0
    while (j < 4) {
      xiP -= beta(j) * math.sin(2 * (j + 1) * xi) * math.cosh(2 * (j + 1) * eta)
      etaP -= beta(j) * math.cos(2 * (j + 1) * xi) * math.sinh(2 * (j + 1) * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var lat = chi
    j = 0
    while (j < 4) {
      lat += delta(j) * math.sin(2 * (j + 1) * chi)
      j += 1
    }
    val lon = math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(lon + lon0), math.toDegrees(lat))
  }

  @inline private def atanh(v: Double): Double = 0.5 * math.log((1 + v) / (1 - v))
  @inline private def asinh(v: Double): Double = math.log(v + math.sqrt(v * v + 1))

  private val R = 6378137.0

  /** lon/lat degrees -> EPSG:3857 meters. */
  def wgs84ToMercator(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val x = R * math.toRadians(lonDeg)
    val y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(latDeg) / 2))
    (x, y)
  }

  /** Slippy-map tile (x, y) at zoom z containing the lon/lat point. */
  def tileAt(lonDeg: Double, latDeg: Double, z: Int): (Int, Int) = {
    val nTiles = 1 << z
    val tx = ((lonDeg + 180.0) / 360.0 * nTiles).toInt
    val latRad = math.toRadians(latDeg)
    val ty = ((1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * nTiles).toInt
    (math.min(math.max(tx, 0), nTiles - 1), math.min(math.max(ty, 0), nTiles - 1))
  }

  /** Tile for an EPSG:3006 point. z14 per the north rule. */
  def tileOfSweref(x: Double, y: Double, z: Int): (Int, Int) = {
    val (lon, lat) = swerefToWgs84(x, y)
    tileAt(lon, lat, z)
  }

  /** ST_TileEnvelope equivalent: tile bounds in EPSG:3857 meters. */
  def tileEnvelope3857(z: Int, tx: Int, ty: Int): Envelope = {
    val worldSize = 2 * math.Pi * R
    val tileSize = worldSize / (1 << z)
    val minX = -worldSize / 2 + tx * tileSize
    val maxY = worldSize / 2 - ty * tileSize
    Envelope(minX, maxY - tileSize, minX + tileSize, maxY)
  }
}
