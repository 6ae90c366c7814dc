package graft.raster

/** Pluggable CRS transforms without GDAL/PROJ on the JVM.
  *
  * The reference accepts any OGR SRS string (`utils.py:get_sr`, used from
  * `geometry/sources.py:88-95` and `raster/sources.py:119-145`); this object
  * covers the codes real data actually arrives in:
  *
  *  - EPSG:4326 (WGS84 lon/lat) — identity hub.
  *  - EPSG:3857 (web mercator) — spherical closed form.
  *  - EPSG:28992 (RD New) — published Schreutelkamp & Strang van Hees
  *    approximation polynomials (~25 cm, the standard GDAL-free path).
  *  - UTM: EPSG:326zz / 327zz (WGS84 north/south) and EPSG:258zz
  *    (ETRS89 / GRS80) — ellipsoidal Transverse Mercator via the 6th-order
  *    Krüger series in n (Karney, "Transverse Mercator with an accuracy of
  *    a few nanometers", J. Geodesy 85, 2011; series also in Deakin et al.
  *    and on the standard TM literature) — sub-µm round-trips inside a
  *    zone, well past the 1e-6 m target.
  *  - Lambert Conformal Conic 2SP (Snyder / EPSG method 9802):
  *    EPSG:2154 (RGF93 / Lambert-93) and the nine French CC zones
  *    EPSG:3942-3950.
  *  - EPSG:27700 (British National Grid) — TM on Airy 1830 plus the
  *    published WGS84↔OSGB36 Helmert 7-parameter shift through geocentric
  *    XYZ (the OS guide's single-Helmert approximation, ~2 m vs the OSTN
  *    correction grid — the standard grid-free path).
  *
  * Transforms compose through the WGS84 lon/lat hub. The three original
  * codes keep their exact pre-existing code paths (bit-identical results).
  */
object Proj extends Serializable {

  private val R = 6378137.0 // web mercator sphere radius

  private val Utm = """EPSG:32([67])(\d\d)""".r
  private val EtrsUtm = """EPSG:258(\d\d)""".r

  private val UrnEpsg = """URN:OGC:DEF:CRS:EPSG:[^:]*:(\d+)""".r
  private val DoubleColon = """EPSG::(\d+)""".r

  def normalize(code: String): String =
    // WKT SRS text (ArcGIS/QGIS .prj files, gpkg definitions): resolve to
    // an EPSG code or fail loudly — unlike unknown authority codes, WKT
    // that doesn't resolve can never match anything downstream
    if (WktSrs.looksLikeWkt(code)) WktSrs.toEpsg(code) match {
      case Right(epsg) => normalize(epsg)
      case Left(why) => throw new IllegalArgumentException(s"unsupported WKT SRS: $why")
    } else code.trim.toUpperCase match {
      case "EPSG:4326" | "WGS84" => "EPSG:4326"
      // RFC 7946 / OGC spellings of WGS84 lon/lat
      case "CRS84" | "OGC:CRS84" | "URN:OGC:DEF:CRS:OGC:1.3:CRS84" => "EPSG:4326"
      // geographic CRSs whose datums coincide with WGS84 at the hub's
      // grid-free accuracy (~1-2 m): ETRS89, RGF93, NAD83 — the same
      // convention the projected hub families already use
      case "EPSG:4258" | "EPSG:4171" | "EPSG:4269" => "EPSG:4326"
      case "EPSG:3857" | "EPSG:900913" => "EPSG:3857"
      case "EPSG:28992" => "EPSG:28992"
      // OGC URN and double-colon authority forms collapse to EPSG:<code>
      case UrnEpsg(c) => normalize(s"EPSG:$c")
      case DoubleColon(c) => normalize(s"EPSG:$c")
      case other => other
    }

  def supported(code: String): Boolean =
    if (WktSrs.looksLikeWkt(code)) WktSrs.toEpsg(code).toOption.exists(supported)
    else normalize(code) match {
      case "EPSG:4326" | "EPSG:3857" | "EPSG:28992" | "EPSG:27700" => true
      case u => utmSpec(u).isDefined || lccSpec(u).isDefined ||
        psSpec(u).isDefined || albersSpec(u).isDefined || paramSpec(u).isDefined
    }

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
    case "EPSG:27700" => osgbToWgs84(x, y)
    case other => utmSpec(other).map(_.inverse(x, y))
      .orElse(lccSpec(other).map(_.inverse(x, y)))
      .orElse(psSpec(other).map(_.inverse(x, y)))
      .orElse(albersSpec(other).map(_.inverse(x, y)))
      .orElse(paramSpec(other).map(_.toWgs84(x, y)))
      .getOrElse(throw new IllegalArgumentException(s"unsupported projection $other"))
  }

  private def fromWgs84(code: String, lon: Double, lat: Double): (Double, Double) = code match {
    case "EPSG:4326" => (lon, lat)
    case "EPSG:3857" =>
      (R * math.toRadians(lon),
        R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))
    case "EPSG:28992" => wgs84ToRd(lon, lat)
    case "EPSG:27700" => wgs84ToOsgb(lon, lat)
    case other => utmSpec(other).map(_.forward(lon, lat))
      .orElse(lccSpec(other).map(_.forward(lon, lat)))
      .orElse(psSpec(other).map(_.forward(lon, lat)))
      .orElse(albersSpec(other).map(_.forward(lon, lat)))
      .orElse(paramSpec(other).map(_.fromWgs84(lon, lat)))
      .getOrElse(throw new IllegalArgumentException(s"unsupported projection $other"))
  }

  // --- ellipsoidal Transverse Mercator (Krüger series, 6th order in n) -----

  /** Ellipsoid + TM grid parameters. UTM: k0 = 0.9996, false easting
    * 500 km, false northing 10 000 km in the southern hemisphere. */
  final case class TmSpec(a: Double, invF: Double, lon0Deg: Double,
      k0: Double, falseE: Double, falseN: Double, lat0Deg: Double = 0.0) {
    private val f = 1.0 / invF
    private val n = f / (2.0 - f)
    private val e = math.sqrt(f * (2.0 - f)) // first eccentricity
    // rectifying radius: A = a/(1+n) (1 + n²/4 + n⁴/64 + n⁶/256)
    private val bigA = a / (1.0 + n) *
      (1.0 + n * n / 4.0 + math.pow(n, 4) / 64.0 + math.pow(n, 6) / 256.0)

    // forward series coefficients α_j
    private val alpha: Array[Double] = {
      val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
      Array(
        n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0 -
          127.0 * n5 / 288.0 + 7891.0 * n6 / 37800.0,
        13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0 +
          281.0 * n5 / 630.0 - 1983433.0 * n6 / 1935360.0,
        61.0 * n3 / 240.0 - 103.0 * n4 / 140.0 + 15061.0 * n5 / 26880.0 +
          167603.0 * n6 / 181440.0,
        49561.0 * n4 / 161280.0 - 179.0 * n5 / 168.0 + 6601661.0 * n6 / 7257600.0,
        34729.0 * n5 / 80640.0 - 3418889.0 * n6 / 1995840.0,
        212378941.0 * n6 / 319334400.0)
    }
    // inverse series coefficients β_j
    private val beta: Array[Double] = {
      val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
      Array(
        n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0 -
          81.0 * n5 / 512.0 + 96199.0 * n6 / 604800.0,
        n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0 + 46.0 * n5 / 105.0 -
          1118711.0 * n6 / 3870720.0,
        17.0 * n3 / 480.0 - 37.0 * n4 / 840.0 - 209.0 * n5 / 4480.0 +
          5569.0 * n6 / 90720.0,
        4397.0 * n4 / 161280.0 - 11.0 * n5 / 504.0 - 830251.0 * n6 / 7257600.0,
        4583.0 * n5 / 161280.0 - 108847.0 * n6 / 3991680.0,
        20648693.0 * n6 / 638668800.0)
    }
    // conformal → geodetic latitude series δ_j
    private val delta: Array[Double] = {
      val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
      Array(
        2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3 + 116.0 * n4 / 45.0 +
          26.0 * n5 / 45.0 - 2854.0 * n6 / 675.0,
        7.0 * n2 / 3.0 - 8.0 * n3 / 5.0 - 227.0 * n4 / 45.0 +
          2704.0 * n5 / 315.0 + 2323.0 * n6 / 945.0,
        56.0 * n3 / 15.0 - 136.0 * n4 / 35.0 - 1262.0 * n5 / 105.0 +
          73814.0 * n6 / 2835.0,
        4279.0 * n4 / 630.0 - 332.0 * n5 / 35.0 - 399572.0 * n6 / 14175.0,
        4174.0 * n5 / 315.0 - 144838.0 * n6 / 6237.0,
        601676.0 * n6 / 22275.0)
    }

    /** Rectifying ordinate ξ of a latitude (meridian arc / A). */
    private def xiOf(latDeg: Double): Double = {
      val t = math.sinh(atanh(math.sin(math.toRadians(latDeg))) -
        e * atanh(e * math.sin(math.toRadians(latDeg))))
      val xiP = math.atan(t)
      var xi = xiP
      var j = 1
      while (j <= 6) { xi += alpha(j - 1) * math.sin(2.0 * j * xiP); j += 1 }
      xi
    }
    // natural-origin latitude: its meridian distance is subtracted from
    // northings (OSGB-style grids anchor at a non-equator latitude)
    private val n0 = if (lat0Deg == 0.0) 0.0 else k0 * bigA * xiOf(lat0Deg)

    /** (lon, lat) degrees → (easting, northing) metres. */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg - lon0Deg)
      val sinPhi = math.sin(phi)
      // conformal latitude via t = sinh(atanh sinφ − e·atanh(e sinφ))
      val t = math.sinh(atanh(sinPhi) - e * atanh(e * sinPhi))
      val xiP = math.atan2(t, math.cos(lam))
      val etaP = atanh(math.sin(lam) / math.hypot(1.0, t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 6) {
        xi += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
        eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
        j += 1
      }
      (falseE + k0 * bigA * eta, falseN - n0 + k0 * bigA * xi)
    }

    /** (easting, northing) metres → (lon, lat) degrees. */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - falseN + n0) / (k0 * bigA)
      val eta = (x - falseE) / (k0 * bigA)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 6) {
        xiP -= beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
        etaP -= beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      var phi = chi
      j = 1
      while (j <= 6) {
        phi += delta(j - 1) * math.sin(2.0 * j * chi)
        j += 1
      }
      val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
      (lon0Deg + math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  private def atanh(v: Double): Double = 0.5 * math.log((1.0 + v) / (1.0 - v))

  private val Wgs84InvF = 298.257223563
  private val Grs80InvF = 298.257222101

  // TmSpec is tiny and immutable; memoize per code so the coefficient
  // series computes once per JVM (executors included — the map is inside
  // the serialized-by-reference object)
  private val tmCache = new java.util.concurrent.ConcurrentHashMap[String, Option[TmSpec]]()

  // --- datum shifts (Helmert 7-parameter, position-vector convention) ----

  /** Geodetic (lon, lat in degrees, h = 0) → geocentric XYZ on (a, invF). */
  private def toXyz(a: Double, invF: Double, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val f = 1.0 / invF; val e2 = f * (2.0 - f)
    val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
    val nu = a / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))
    (nu * math.cos(phi) * math.cos(lam), nu * math.cos(phi) * math.sin(lam),
      (1.0 - e2) * nu * math.sin(phi))
  }

  /** Geocentric XYZ → geodetic (lon, lat in degrees) on (a, invF);
    * fixed-point latitude iteration (converges in a handful of rounds). */
  private def toGeodetic(a: Double, invF: Double, x: Double, y: Double, z: Double): (Double, Double) = {
    val f = 1.0 / invF; val e2 = f * (2.0 - f)
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1.0 - e2))
    var i = 0
    while (i < 10) {
      val nu = a / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))
      phi = math.atan2(z + e2 * nu * math.sin(phi), p)
      i += 1
    }
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
  }

  /** Helmert, position-vector sign convention; t in metres, r in radians,
    * s unitless. */
  private def helmert(t: (Double, Double, Double), r: (Double, Double, Double),
      s: Double, x: Double, y: Double, z: Double): (Double, Double, Double) = {
    val m = 1.0 + s
    (t._1 + m * (x - r._3 * y + r._2 * z),
      t._2 + m * (r._3 * x + y - r._1 * z),
      t._3 + m * (-r._2 * x + r._1 * y + z))
  }

  private def arcsec(v: Double): Double = math.toRadians(v / 3600.0)

  // WGS84 → OSGB36 (OS "A guide to coordinate systems in Great Britain",
  // the standard single-Helmert approximation, ~2 m vs the OSTN grid)
  private val Osgb36T = (-446.448, 125.157, -542.060)
  private val Osgb36R = (arcsec(-0.1502), arcsec(-0.2470), arcsec(-0.8421))
  private val Osgb36S = 20.4894e-6
  private val AiryA = 6377563.396
  private val AiryInvF = 299.3249646

  /** British National Grid (EPSG:27700): TM on Airy 1830 anchored at
    * 49°N 2°W (k0 = 0.9996012717, FE 400 km, FN −100 km), on the OSGB36
    * datum reached from the WGS84 hub by the published Helmert shift. */
  val osgbGrid: TmSpec = TmSpec(AiryA, AiryInvF, -2.0, 0.9996012717,
    400000.0, -100000.0, lat0Deg = 49.0)

  private def wgs84ToOsgb(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = toXyz(6378137.0, Wgs84InvF, lon, lat)
    val (x2, y2, z2) = helmert(Osgb36T, Osgb36R, Osgb36S, x, y, z)
    val (lon36, lat36) = toGeodetic(AiryA, AiryInvF, x2, y2, z2)
    osgbGrid.forward(lon36, lat36)
  }

  private def osgbToWgs84(e: Double, n: Double): (Double, Double) = {
    val (lon36, lat36) = osgbGrid.inverse(e, n)
    val (x, y, z) = toXyz(AiryA, AiryInvF, lon36, lat36)
    // inverse shift: negated parameters (standard first-order inverse,
    // second-order residual ~0.1 mm at earth radius)
    val (x2, y2, z2) = helmert(
      (-Osgb36T._1, -Osgb36T._2, -Osgb36T._3),
      (-Osgb36R._1, -Osgb36R._2, -Osgb36R._3), -Osgb36S, x, y, z)
    toGeodetic(6378137.0, Wgs84InvF, x2, y2, z2)
  }

  // --- Lambert Conformal Conic, 2 standard parallels (EPSG method 9802) ---

  /** Snyder's ellipsoidal LCC — 2SP (EPSG 9802) and, when the parallels
    * coincide, 1SP (EPSG 9801: n = sin(φ1), scale factor k0). Angles in
    * degrees in the public API, radians internally. Exact closed forms
    * except the inverse latitude, which converges quadratically in a few
    * fixed-point rounds. */
  final case class LccSpec(a: Double, invF: Double, phi1Deg: Double,
      phi2Deg: Double, phi0Deg: Double, lon0Deg: Double,
      falseE: Double, falseN: Double, k0: Double = 1.0) {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private def m(phi: Double): Double =
      math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))
    private def tf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2)
    private val phi1 = math.toRadians(phi1Deg)
    private val phi2 = math.toRadians(phi2Deg)
    private val lon0 = math.toRadians(lon0Deg)
    // coincident parallels are the 1SP limit of the 2SP cone constant
    private val n = if (phi1Deg == phi2Deg) math.sin(phi1)
      else (math.log(m(phi1)) - math.log(m(phi2))) /
        (math.log(tf(phi1)) - math.log(tf(phi2)))
    private val bigF = k0 * m(phi1) / (n * math.pow(tf(phi1), n))
    private val rho0 = a * bigF * math.pow(tf(math.toRadians(phi0Deg)), n)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = a * bigF * math.pow(tf(math.toRadians(latDeg)), n)
      val th = n * (math.toRadians(lonDeg) - lon0)
      (falseE + rho * math.sin(th), falseN + rho0 - rho * math.cos(th))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseE
      val dy = rho0 - (y - falseN)
      // sqrt of the naive sum, not Math.hypot: both are sub-ulp here (no
      // overflow at map scale) but only this form is reproducible in SQL
      // oracles — +, ×, sqrt are IEEE-exact, hypot's algorithm is not
      val rho = math.signum(n) * math.sqrt(dx * dx + dy * dy)
      val tp = math.pow(rho / (a * bigF), 1.0 / n)
      val th = math.atan2(math.signum(n) * dx, math.signum(n) * dy)
      var phi = math.Pi / 2 - 2.0 * math.atan(tp)
      var i = 0
      while (i < 8) {
        phi = math.Pi / 2 - 2.0 * math.atan(tp *
          math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2))
        i += 1
      }
      (math.toDegrees(lon0 + th / n), math.toDegrees(phi))
    }
  }

  /** LCC-projected codes: EPSG:2154 (RGF93 / Lambert-93, GRS80 — standard
    * parallels 44°/49°, origin 46.5°N 3°E, FE 700 km FN 6600 km) and the
    * nine French CC zones EPSG:3942-3950 (CC42-CC50: for latitude L =
    * 42+zone, parallels L∓0.75, origin L°N 3°E, FE 1700 km,
    * FN (zone+1)·1000 km + 200 km). RGF93 rides the WGS84 hub (the datums
    * agree to centimetres). */
  private def lccSpec(code: String): Option[LccSpec] =
    lccCache.computeIfAbsent(code, {
      case "EPSG:2154" => Some(LccSpec(6378137.0, Grs80InvF,
        44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0))
      case FrCc(zz) =>
        val z = zz.toInt // 3942..3950 → latitude 42..50
        val lat = 42.0 + (z - 3942)
        Some(LccSpec(6378137.0, Grs80InvF, lat - 0.75, lat + 0.75, lat, 3.0,
          1700000.0, (z - 3942 + 1) * 1000000.0 + 200000.0))
      case _ => None
    })

  private val FrCc = """EPSG:(394[2-9]|3950)""".r
  private val lccCache = new java.util.concurrent.ConcurrentHashMap[String, Option[LccSpec]]()

  // --- Polar Stereographic, variant B (EPSG method 9829, Snyder §21) ------

  /** Ellipsoidal polar stereographic anchored by a standard parallel
    * (latitude of true scale). The north-aspect closed forms are Snyder
    * 21-33/34 with 15-9; the south aspect is the north aspect applied to
    * (−φ, −Δλ) with both outputs negated (the standard symmetry). The
    * inverse latitude iterates Snyder 7-9, converging quadratically. */
  final case class PsSpec(a: Double, invF: Double, latTsDeg: Double,
      lon0Deg: Double, falseE: Double, falseN: Double, south: Boolean,
      k0: Double = Double.NaN) {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    // t (15-9) at the north-aspect equivalent of the standard parallel
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2)
    private val phiTsN = math.toRadians(if (south) -latTsDeg else latTsDeg)
    // ρ = a·rhoCoef·t(φ): variant B anchors at the standard parallel
    // (rhoCoef = mC/tC, Snyder 21-34), variant A at the pole with a scale
    // factor (rhoCoef = 2k0/√((1+e)^(1+e)(1−e)^(1−e)), Snyder 21-33)
    private val rhoCoef =
      if (!k0.isNaN) 2.0 * k0 /
        math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e))
      else math.cos(phiTsN) /
        math.sqrt(1.0 - e2 * math.sin(phiTsN) * math.sin(phiTsN)) / tOf(phiTsN)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val sgn = if (south) -1.0 else 1.0
      val phi = sgn * math.toRadians(latDeg)
      val dLam = sgn * math.toRadians(lonDeg - lon0Deg)
      val rho = a * rhoCoef * tOf(phi)
      (falseE + sgn * rho * math.sin(dLam), falseN - sgn * rho * math.cos(dLam))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val sgn = if (south) -1.0 else 1.0
      val dx = sgn * (x - falseE)
      val dy = sgn * (y - falseN)
      val rho = math.hypot(dx, dy)
      val t = rho / (a * rhoCoef)
      var phi = math.Pi / 2 - 2.0 * math.atan(t)
      var i = 0
      while (i < 8) {
        phi = math.Pi / 2 - 2.0 * math.atan(t *
          math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2))
        i += 1
      }
      val dLam = if (rho == 0.0) 0.0 else math.atan2(dx, -dy)
      (lon0Deg + sgn * math.toDegrees(dLam), sgn * math.toDegrees(phi))
    }
  }

  /** Polar codes (all WGS84, FE = FN = 0): EPSG:3031 (Antarctic Polar
    * Stereographic, true scale 71°S, λ0 = 0), EPSG:3413 (NSIDC Sea Ice
    * Polar Stereographic North, 70°N, λ0 = −45°), EPSG:3976 (NSIDC Sea
    * Ice Polar Stereographic South, 70°S, λ0 = 0), EPSG:3995 (Arctic
    * Polar Stereographic, 71°N, λ0 = 0). */
  private def psSpec(code: String): Option[PsSpec] =
    psCache.computeIfAbsent(code, {
      case "EPSG:3031" => Some(PsSpec(6378137.0, Wgs84InvF, -71.0, 0.0,
        0.0, 0.0, south = true))
      case "EPSG:3413" => Some(PsSpec(6378137.0, Wgs84InvF, 70.0, -45.0,
        0.0, 0.0, south = false))
      case "EPSG:3976" => Some(PsSpec(6378137.0, Wgs84InvF, -70.0, 0.0,
        0.0, 0.0, south = true))
      case "EPSG:3995" => Some(PsSpec(6378137.0, Wgs84InvF, 71.0, 0.0,
        0.0, 0.0, south = false))
      case _ => None
    })
  private val psCache = new java.util.concurrent.ConcurrentHashMap[String, Option[PsSpec]]()

  /** Test hook: a PsSpec with arbitrary parameters (EPSG guidance worked
    * examples use non-EPSG-code parameter sets). */
  def psSpecFor(a: Double, invF: Double, latTsDeg: Double, lon0Deg: Double,
      falseE: Double, falseN: Double, south: Boolean): PsSpec =
    PsSpec(a, invF, latTsDeg, lon0Deg, falseE, falseN, south)

  // --- Albers Equal Area (EPSG method 9822, Snyder §14) -------------------

  /** Snyder's ellipsoidal Albers: exact closed forms on the authalic
    * latitude function q, inverse latitude via Snyder 3-16 iteration. */
  final case class AlbersSpec(a: Double, invF: Double, phi1Deg: Double,
      phi2Deg: Double, phi0Deg: Double, lon0Deg: Double,
      falseE: Double, falseN: Double) {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private def m(phi: Double): Double =
      math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))
    // Snyder 3-12
    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - e2) * (s / (1.0 - e2 * s * s) -
        (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    private val phi1 = math.toRadians(phi1Deg)
    private val phi2 = math.toRadians(phi2Deg)
    private val m1 = m(phi1); private val m2 = m(phi2)
    private val n = (m1 * m1 - m2 * m2) / (q(phi2) - q(phi1))
    private val bigC = m1 * m1 + n * q(phi1)
    private val rho0 = a * math.sqrt(bigC - n * q(math.toRadians(phi0Deg))) / n

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = a * math.sqrt(bigC - n * q(math.toRadians(latDeg))) / n
      val th = n * math.toRadians(lonDeg - lon0Deg)
      (falseE + rho * math.sin(th), falseN + rho0 - rho * math.cos(th))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseE
      val dy = rho0 - (y - falseN)
      val rho = math.hypot(dx, dy)
      val qv = (bigC - rho * rho * n * n / (a * a)) / n
      val th = math.atan2(math.signum(n) * dx, math.signum(n) * dy)
      // Snyder 3-16 fixed-point for φ from q
      var phi = math.asin(math.min(1.0, math.max(-1.0, qv / 2.0)))
      var i = 0
      while (i < 12) {
        val s = math.sin(phi)
        val d = 1.0 - e2 * s * s
        phi += d * d / (2.0 * math.cos(phi)) * (qv / (1.0 - e2) -
          s / d + (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
        i += 1
      }
      (math.toDegrees(math.toRadians(lon0Deg) + th / n), math.toDegrees(phi))
    }
  }

  /** Albers codes: EPSG:5070 (NAD83 / Conus Albers — parallels
    * 29.5°/45.5°, origin 23°N 96°W, GRS80). NAD83 rides the WGS84 hub
    * (the datums agree to ~1-2 m, the same grid-free convention as
    * RGF93/ETRS89). */
  private def albersSpec(code: String): Option[AlbersSpec] =
    albersCache.computeIfAbsent(code, {
      case "EPSG:5070" => Some(AlbersSpec(6378137.0, Grs80InvF,
        29.5, 45.5, 23.0, -96.0, 0.0, 0.0))
      case _ => None
    })
  private val albersCache = new java.util.concurrent.ConcurrentHashMap[String, Option[AlbersSpec]]()

  /** Test hook: an AlbersSpec with arbitrary parameters (Snyder's worked
    * example is on Clarke 1866). */
  def albersSpecFor(a: Double, invF: Double, phi1Deg: Double, phi2Deg: Double,
      phi0Deg: Double, lon0Deg: Double, falseE: Double, falseN: Double): AlbersSpec =
    AlbersSpec(a, invF, phi1Deg, phi2Deg, phi0Deg, lon0Deg, falseE, falseN)

  /** UTM family parser: EPSG:326zz/327zz (WGS84 N/S), EPSG:258zz (ETRS89 —
    * GRS80 ellipsoid, northern zones 28-38 in use). Zone zz ∈ 1..60; the
    * central meridian is (6·zz − 183)°. */
  private def utmSpec(code: String): Option[TmSpec] =
    tmCache.computeIfAbsent(code, {
      case Utm(hemi, zz) =>
        val zone = zz.toInt
        if (zone < 1 || zone > 60) None
        else Some(TmSpec(6378137.0, Wgs84InvF, 6.0 * zone - 183.0, 0.9996,
          500000.0, if (hemi == "7") 10000000.0 else 0.0))
      case EtrsUtm(zz) =>
        val zone = zz.toInt
        if (zone < 1 || zone > 60) None
        else Some(TmSpec(6378137.0, Grs80InvF, 6.0 * zone - 183.0, 0.9996,
          500000.0, 0.0))
      case _ => None
    })

  // --- ellipsoidal Mercator (EPSG methods 9804/9805, Snyder §7) -----------

  /** Ellipsoidal Mercator — 1SP (k0 given) or 2SP (k0 = m(φ1) computed by
    * the caller). Distinct from the spherical web-mercator closed form:
    * EPSG:3395 (WGS 84 / World Mercator) is this projection, and snapping
    * it to 3857 is a km-scale error at mid latitudes. */
  final case class MercSpec(a: Double, invF: Double, lon0Deg: Double,
      k0: Double, falseE: Double, falseN: Double) {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val s = math.sin(phi)
      val y = a * k0 * math.log(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2))
      (falseE + a * k0 * math.toRadians(lonDeg - lon0Deg), falseN + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-(y - falseN) / (a * k0))
      var phi = math.Pi / 2 - 2.0 * math.atan(t)
      var i = 0
      while (i < 8) {
        phi = math.Pi / 2 - 2.0 * math.atan(t *
          math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2))
        i += 1
      }
      (lon0Deg + math.toDegrees((x - falseE) / (a * k0)), math.toDegrees(phi))
    }
  }

  // --- Swiss Oblique Mercator (EPSG method 9814, Rosenmund) ----------------

  /** The Swiss double projection: ellipsoid → conformal sphere → oblique
    * equatorial aspect → Mercator (Swisstopo's published exact formulas;
    * EPSG 9814). CH1903/LV03 (EPSG:21781) and CH1903+/LV95 (EPSG:2056)
    * differ only in the false origin. GDAL/ESRI spell it
    * Hotine_Oblique_Mercator_Azimuth_Center with azimuth = rectified
    * grid angle = 90°, to which 9814 is equivalent at these parameters. */
  final case class SomercSpec(a: Double, invF: Double, lat0Deg: Double,
      lon0Deg: Double, falseE: Double, falseN: Double) {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private val phi0 = math.toRadians(lat0Deg)
    private val sin0 = math.sin(phi0)
    // radius of the projection sphere and sphere↔ellipsoid constants
    private val bigR = a * math.sqrt(1.0 - e2) / (1.0 - e2 * sin0 * sin0)
    private val alpha = math.sqrt(1.0 + e2 / (1.0 - e2) * math.pow(math.cos(phi0), 4))
    private val b0 = math.asin(sin0 / alpha)
    private val bigK = math.log(math.tan(math.Pi / 4 + b0 / 2)) -
      alpha * math.log(math.tan(math.Pi / 4 + phi0 / 2) *
        math.pow((1.0 - e * sin0) / (1.0 + e * sin0), e / 2))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val s = math.sin(phi)
      val bigS = alpha * math.log(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2)) + bigK
      val b = 2.0 * (math.atan(math.exp(bigS)) - math.Pi / 4)
      val l = alpha * (math.toRadians(lonDeg) - math.toRadians(lon0Deg))
      // rotate to the pseudo-equator through the projection center
      val bBar = math.asin(math.cos(b0) * math.sin(b) -
        math.sin(b0) * math.cos(b) * math.cos(l))
      val lBar = math.asin(math.cos(b) * math.sin(l) / math.cos(bBar))
      (falseE + bigR * lBar,
        falseN + bigR * math.log(math.tan(math.Pi / 4 + bBar / 2)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val lBar = (x - falseE) / bigR
      val bBar = 2.0 * (math.atan(math.exp((y - falseN) / bigR)) - math.Pi / 4)
      val b = math.asin(math.cos(b0) * math.sin(bBar) +
        math.sin(b0) * math.cos(bBar) * math.cos(lBar))
      val l = math.asin(math.cos(bBar) * math.sin(lBar) / math.cos(b))
      val lonDeg = lon0Deg + math.toDegrees(l / alpha)
      // invert the conformal-latitude mapping by fixed point on φ
      val bigS = math.log(math.tan(math.Pi / 4 + b / 2))
      var phi = b
      var i = 0
      while (i < 12) {
        phi = 2.0 * math.atan(math.exp((bigS - bigK) / alpha +
          e * atanh(e * math.sin(phi)))) - math.Pi / 2
        i += 1
      }
      (lonDeg, math.toDegrees(phi))
    }
  }

  // --- parameterized CRS codes ("PARAM:FAM:K=V;K=V;...") -------------------
  //
  // Produced by WktSrs when a .prj's projection method is a supported
  // family but its parameters match no hub EPSG code (a US state-plane
  // zone, a custom-parallels Albers, World Mercator...). The reference
  // accepts these through OGR (utils.py:397 SetFromUserInput); here the
  // whole definition is carried in the code string itself, so any executor
  // reconstructs the transform with no driver-shared state.
  //
  // Keys (canonical order, uppercase): A, INVF (ellipsoid), family
  // parameters in degrees/metres (LON0, LAT0, SP1, SP2, K0, FE, FN),
  // UNIT (metres per coordinate unit, when not 1 — US survey feet grids),
  // DX..DS (TOWGS84 position-vector datum shift to WGS84: metres, arcsec,
  // ppm). Families: TM, LCC, AEA, PS, MERC.

  private[raster] final case class ParamCrs(a: Double, invF: Double,
      fwdM: (Double, Double) => (Double, Double),
      invM: (Double, Double) => (Double, Double),
      unit: Double, shift: Option[Array[Double]]) {

    def toWgs84(x: Double, y: Double): (Double, Double) = {
      val (lonL, latL) = invM(x * unit, y * unit)
      shift match {
        case None => (lonL, latL)
        case Some(s) =>
          val (gx, gy, gz) = toXyz(a, invF, lonL, latL)
          val (wx, wy, wz) = helmert((s(0), s(1), s(2)),
            (arcsec(s(3)), arcsec(s(4)), arcsec(s(5))), s(6) * 1e-6, gx, gy, gz)
          toGeodetic(6378137.0, Wgs84InvF, wx, wy, wz)
      }
    }

    def fromWgs84(lon: Double, lat: Double): (Double, Double) = {
      val (lonL, latL) = shift match {
        case None => (lon, lat)
        case Some(s) =>
          val (wx, wy, wz) = toXyz(6378137.0, Wgs84InvF, lon, lat)
          val (gx, gy, gz) = helmert((-s(0), -s(1), -s(2)),
            (arcsec(-s(3)), arcsec(-s(4)), arcsec(-s(5))), -s(6) * 1e-6, wx, wy, wz)
          toGeodetic(a, invF, gx, gy, gz)
      }
      val (x, y) = fwdM(lonL, latL)
      (x / unit, y / unit)
    }
  }

  private val paramCache = new java.util.concurrent.ConcurrentHashMap[String, Option[ParamCrs]]()

  private[raster] def paramSpec(code: String): Option[ParamCrs] =
    if (!code.startsWith("PARAM:")) None
    else paramCache.computeIfAbsent(code, c => try {
      val parts = c.split(":", 3)
      val fam = parts(1).toUpperCase
      val kv = parts(2).split(";").iterator.map(_.split("=", 2))
        .map(a => a(0).toUpperCase -> a(1).toDouble).toMap
      def opt(k: String, d: Double): Double = kv.getOrElse(k, d)
      val a0 = kv("A"); val invF = kv("INVF")
      val unit = opt("UNIT", 1.0)
      val shift = if (kv.contains("DX"))
        Some(Array(kv("DX"), kv("DY"), kv("DZ"), opt("RX", 0.0), opt("RY", 0.0),
          opt("RZ", 0.0), opt("DS", 0.0)))
      else None
      val fwdInv: Option[((Double, Double) => (Double, Double), (Double, Double) => (Double, Double))] =
        fam match {
          case "TM" =>
            val s = TmSpec(a0, invF, kv("LON0"), opt("K0", 1.0), opt("FE", 0.0),
              opt("FN", 0.0), lat0Deg = opt("LAT0", 0.0))
            Some((s.forward _, s.inverse _))
          case "LCC" if kv.contains("SP1") =>
            // SP2 absent (or equal) is the 1SP form; K0 defaults to 1
            val s = LccSpec(a0, invF, kv("SP1"), opt("SP2", kv("SP1")),
              opt("LAT0", kv("SP1")), kv("LON0"), opt("FE", 0.0), opt("FN", 0.0),
              opt("K0", 1.0))
            Some((s.forward _, s.inverse _))
          case "AEA" if kv.contains("SP1") && kv.contains("SP2") =>
            val s = AlbersSpec(a0, invF, kv("SP1"), kv("SP2"),
              opt("LAT0", 0.0), kv("LON0"), opt("FE", 0.0), opt("FN", 0.0))
            Some((s.forward _, s.inverse _))
          case "PS" =>
            val south = opt("SOUTH", 0.0) != 0.0
            val s = if (kv.contains("K0")) // variant A: pole origin + scale
              PsSpec(a0, invF, if (south) -90.0 else 90.0, kv("LON0"),
                opt("FE", 0.0), opt("FN", 0.0), south, k0 = kv("K0"))
            else PsSpec(a0, invF, kv("SP1"), kv("LON0"),
              opt("FE", 0.0), opt("FN", 0.0), south)
            Some((s.forward _, s.inverse _))
          case "SOMERC" =>
            val s = SomercSpec(a0, invF, kv("LAT0"), kv("LON0"),
              opt("FE", 0.0), opt("FN", 0.0))
            Some((s.forward _, s.inverse _))
          case "MERC" =>
            // 2SP: k0 = m(φ1) (EPSG 9805); 1SP: explicit k0 (9804)
            val k0 = if (kv.contains("SP1")) {
              val f = 1.0 / invF; val e2 = f * (2.0 - f)
              val p1 = math.toRadians(kv("SP1"))
              math.cos(p1) / math.sqrt(1.0 - e2 * math.sin(p1) * math.sin(p1))
            } else opt("K0", 1.0)
            val s = MercSpec(a0, invF, opt("LON0", 0.0), k0, opt("FE", 0.0), opt("FN", 0.0))
            Some((s.forward _, s.inverse _))
          case _ => None
        }
      fwdInv.map { case (f0, i0) => ParamCrs(a0, invF, f0, i0, unit, shift) }
    } catch { case _: RuntimeException => None })

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
