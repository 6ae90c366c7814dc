package graft.raster

/** Minimal pluggable CRS transforms for the EPSG codes the reference's
  * tests exercise (SURVEY §7.4.6): 4326 (WGS84 lon/lat), 3857 (web
  * mercator, spherical closed form) and 28992 (RD New, via the published
  * Schreutelkamp & Strang van Hees approximation polynomials, ~25 cm
  * accuracy — the standard GDAL-free approximation). Transforms compose
  * through the WGS84 hub. No GDAL/PROJ on the JVM.
  */
object Proj extends Serializable {

  private val R = 6378137.0 // web mercator sphere radius

  def normalize(code: String): String = code.trim.toUpperCase match {
    case "EPSG:4326" | "WGS84" => "EPSG:4326"
    case "EPSG:3857" | "EPSG:900913" => "EPSG:3857"
    case "EPSG:28992" => "EPSG:28992"
    case other => other
  }

  def supported(code: String): Boolean =
    Set("EPSG:4326", "EPSG:3857", "EPSG:28992").contains(normalize(code))

  /** Transform a point; (x, y) = (lon, lat) for 4326. */
  def transform(from: String, to: String, x: Double, y: Double): (Double, Double) = {
    val f = normalize(from); val t = normalize(to)
    if (f == t) return (x, y)
    val (lon, lat) = toWgs84(f, x, y)
    fromWgs84(t, lon, lat)
  }

  private def toWgs84(code: String, x: Double, y: Double): (Double, Double) = code match {
    case "EPSG:4326" => (x, y)
    case "EPSG:3857" =>
      (math.toDegrees(x / R),
        math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2))
    case "EPSG:28992" => rdToWgs84(x, y)
    case other => throw new IllegalArgumentException(s"unsupported projection $other")
  }

  private def fromWgs84(code: String, lon: Double, lat: Double): (Double, Double) = code match {
    case "EPSG:4326" => (lon, lat)
    case "EPSG:3857" =>
      (R * math.toRadians(lon),
        R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))
    case "EPSG:28992" => wgs84ToRd(lon, lat)
    case other => throw new IllegalArgumentException(s"unsupported projection $other")
  }

  // --- RD New (Amersfoort) ↔ WGS84, approximation polynomials -------------
  private val (phi0, lam0) = (52.15517440, 5.38720621)
  private val (x0, y0) = (155000.0, 463000.0)

  // (p, q, coefficient): φ correction in seconds of arc
  private val Kpq = Seq(
    (0, 1, 3235.65389), (2, 0, -32.58297), (0, 2, -0.24750), (2, 1, -0.84978),
    (0, 3, -0.06550), (2, 2, -0.01709), (1, 0, -0.00738), (4, 0, 0.00530),
    (2, 3, -0.00039), (4, 1, 0.00033), (1, 1, -0.00012))
  private val Lpq = Seq(
    (1, 0, 5260.52916), (1, 1, 105.94684), (1, 2, 2.45656), (3, 0, -0.81885),
    (1, 3, 0.05594), (3, 1, -0.05607), (0, 1, 0.01199), (3, 2, -0.00256),
    (1, 4, 0.00128), (0, 2, 0.00022), (2, 0, -0.00022), (5, 0, 0.00026))
  private val Rpq = Seq(
    (0, 1, 190094.945), (1, 1, -11832.228), (2, 1, -114.221), (0, 3, -32.391),
    (1, 0, -0.705), (3, 1, -2.340), (1, 3, -0.608), (0, 2, -0.008), (2, 3, 0.148))
  private val Spq = Seq(
    (1, 0, 309056.544), (0, 2, 3638.893), (2, 0, 73.077), (1, 2, -157.984),
    (3, 0, 59.788), (0, 1, 0.433), (2, 2, -6.439), (1, 1, -0.032),
    (0, 4, 0.092), (1, 4, -0.054))

  private def poly(terms: Seq[(Int, Int, Double)], a: Double, b: Double): Double =
    terms.map { case (p, q, c) => c * math.pow(a, p) * math.pow(b, q) }.sum

  def rdToWgs84(x: Double, y: Double): (Double, Double) = {
    val dX = (x - x0) * 1e-5
    val dY = (y - y0) * 1e-5
    val lat = phi0 + poly(Kpq, dX, dY) / 3600.0
    val lon = lam0 + poly(Lpq, dX, dY) / 3600.0
    (lon, lat)
  }

  def wgs84ToRd(lon: Double, lat: Double): (Double, Double) = {
    val dPhi = 0.36 * (lat - phi0)
    val dLam = 0.36 * (lon - lam0)
    (x0 + poly(Rpq, dPhi, dLam), y0 + poly(Spq, dPhi, dLam))
  }
}
