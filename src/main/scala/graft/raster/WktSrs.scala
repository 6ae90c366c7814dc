package graft.raster

/** WKT SRS strings → EPSG codes, without GDAL/OGR on the JVM.
  *
  * The reference accepts any SRS user input — WKT included — through OGR
  * (`utils.py:397` `get_sr` / `GetUserInputAsWKT`, reached from e.g.
  * `geometry/sources.py:183` when a shapefile carries a `.prj`). Real-world
  * `.prj` files are WKT-1 in two dialects: OGC (carries
  * `AUTHORITY["EPSG","xxxx"]` nodes) and ESRI (ArcGIS — no authority nodes,
  * renamed projections and parameters). This resolver handles both, plus
  * ISO WKT-2 (`PROJCRS`/`ID[...]`), by:
  *
  *   1. taking a root-level `AUTHORITY`/`ID` EPSG code when one is present
  *      and the hub supports it, otherwise
  *   2. matching ellipsoid + projection method + parameters onto the hub's
  *      families (UTM/ETRS89-UTM, BNG, RD New, web mercator, Lambert-93 +
  *      CC zones, polar stereographic, Conus Albers, plain geographic).
  *
  * Grammar (OGC 01-009 §7 / ISO 19162): `KEYWORD[arg, arg, ...]` where an
  * arg is a quoted string (doubled-quote escape), a number, a bare keyword
  * (e.g. axis directions), or a nested node; `(` `)` are accepted for
  * `[` `]`.
  */
object WktSrs {

  /** One parsed `KEYWORD[...]` node. Args are String (quoted or bare),
    * java.lang.Double, or nested Node. */
  final case class Node(name: String, args: Vector[Any]) {
    def children(keyword: String*): Seq[Node] = {
      val want = keyword.map(_.toUpperCase).toSet
      args.collect { case n: Node if want.contains(n.name.toUpperCase) => n }
    }
    def child(keyword: String*): Option[Node] = children(keyword: _*).headOption
    /** First quoted-string argument (conventionally the object name). */
    def label: String = args.collectFirst { case s: String => s }.getOrElse("")
    def numbers: Seq[Double] = args.collect { case d: java.lang.Double => d.doubleValue }
    /** All nodes in this subtree, pre-order. */
    def all: Seq[Node] = this +: args.collect { case n: Node => n.all }.flatten
  }

  /** True when the string looks like WKT rather than an authority code —
    * authority codes ("EPSG:4326", OGC URNs) never contain brackets. */
  def looksLikeWkt(s: String): Boolean = {
    val t = s.trim
    t.nonEmpty && Character.isLetter(t.charAt(0)) &&
      (t.contains('[') || t.contains('('))
  }

  // resolution is called per projection string on hot paths (normalize);
  // parse + match once per distinct WKT text per JVM
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Either[String, String]]()

  /** Resolve WKT to a supported "EPSG:xxxx" code, or a human-readable
    * reason why not. */
  def toEpsg(wkt: String): Either[String, String] =
    cache.computeIfAbsent(wkt, w =>
      try resolve(parse(w))
      catch { case e: IllegalArgumentException => Left(s"malformed WKT: ${e.getMessage}") })

  // --- parser --------------------------------------------------------------

  def parse(s: String): Node = {
    val p = new P(s)
    val n = p.node()
    p.skipWs()
    require(p.atEnd, s"trailing content at offset ${p.pos}")
    n
  }

  private final class P(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (!atEnd && Character.isWhitespace(s.charAt(pos))) pos += 1

    def node(): Node = {
      skipWs()
      val name = bareWord()
      skipWs()
      require(!atEnd && (s.charAt(pos) == '[' || s.charAt(pos) == '('),
        s"expected [ after $name")
      val close = if (s.charAt(pos) == '[') ']' else ')'
      pos += 1
      val args = Vector.newBuilder[Any]
      var first = true
      skipWs()
      while (!atEnd && s.charAt(pos) != close) {
        if (!first) {
          require(s.charAt(pos) == ',', s"expected , at offset $pos")
          pos += 1; skipWs()
        }
        args += arg()
        first = false
        skipWs()
      }
      require(!atEnd, s"unterminated $name")
      pos += 1 // consume close
      Node(name, args.result())
    }

    private def arg(): Any = {
      val c = s.charAt(pos)
      if (c == '"') quoted()
      else if (c == '-' || c == '+' || c == '.' || Character.isDigit(c)) number()
      else {
        // bare keyword (axis directions NORTH/EAST, WKT2 unit keywords);
        // a following bracket makes it a nested node
        val save = pos
        val w = bareWord()
        skipWs()
        if (!atEnd && (s.charAt(pos) == '[' || s.charAt(pos) == '(')) {
          pos = save; node()
        } else w
      }
    }

    private def bareWord(): String = {
      val start = pos
      while (!atEnd && (Character.isLetterOrDigit(s.charAt(pos)) ||
        s.charAt(pos) == '_' || s.charAt(pos) == '.' || s.charAt(pos) == '-')) pos += 1
      require(pos > start, s"expected identifier at offset $start")
      s.substring(start, pos)
    }

    private def quoted(): String = {
      pos += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        require(!atEnd, "unterminated string")
        val c = s.charAt(pos)
        if (c == '"') {
          if (pos + 1 < s.length && s.charAt(pos + 1) == '"') { sb += '"'; pos += 2 }
          else { done = true; pos += 1 }
        } else { sb += c; pos += 1 }
      }
      sb.toString
    }

    private def number(): java.lang.Double = {
      val start = pos
      if (s.charAt(pos) == '-' || s.charAt(pos) == '+') pos += 1
      while (!atEnd && (Character.isDigit(s.charAt(pos)) || s.charAt(pos) == '.' ||
        s.charAt(pos) == 'e' || s.charAt(pos) == 'E' ||
        ((s.charAt(pos) == '-' || s.charAt(pos) == '+') &&
          (s.charAt(pos - 1) == 'e' || s.charAt(pos - 1) == 'E')))) pos += 1
      java.lang.Double.valueOf(s.substring(start, pos))
    }
  }

  // --- resolution ----------------------------------------------------------

  private def resolve(root: Node): Either[String, String] = {
    // 1. explicit EPSG identity on the root: WKT-1 AUTHORITY (last arg by
    //    convention) or WKT-2 ID, as a DIRECT child only — nested GEOGCS /
    //    DATUM authorities describe components, not the CRS
    val direct = root.child("AUTHORITY", "ID").flatMap(authorityCode)
    direct match {
      case Some(code) if Proj.supported(code) => return Right(code)
      case _ => ()
    }
    // 2. family match on ellipsoid + method + parameters. A declared-but-
    //    unsupported EPSG identity means the CRS is NOT one of the hub's
    //    codes, so don't snap it onto a lookalike family (EPSG:3395 is one
    //    "mercator" away from 3857 and kilometres apart at mid latitudes) —
    //    instantiate from its own parameters instead.
    val matched = root.name.toUpperCase match {
      case "GEOGCS" | "GEOGCRS" | "GEODCRS" => matchGeographic(root)
      case "PROJCS" | "PROJCRS" => matchProjected(root, allowSnap = direct.isEmpty)
      case other => Left(s"unsupported WKT root $other")
    }
    (matched, direct) match {
      case (r @ Right(_), _) => r
      case (Left(why), Some(code)) =>
        Left(s"$why (declared authority $code is not a supported code)")
      case (l, None) => l
    }
  }

  private def authorityCode(n: Node): Option[String] = {
    // AUTHORITY["EPSG","4326"] / ID["EPSG",4326[,…]]
    val args = n.args
    val org = args.collectFirst { case s: String => s }
    val code = args.collect {
      case s: String => s
      case d: java.lang.Double => if (d.doubleValue.isValidInt) d.intValue.toString else d.toString
    }.drop(1).headOption
    (org, code) match {
      case (Some(o), Some(c)) if o.equalsIgnoreCase("EPSG") && c.forall(_.isDigit) =>
        Some(s"EPSG:$c")
      case _ => None
    }
  }

  /** (a, 1/f) from the SPHEROID/ELLIPSOID node anywhere in the tree. */
  private def ellipsoid(root: Node): Option[(Double, Double)] =
    root.all.find(n => n.name.equalsIgnoreCase("SPHEROID") ||
      n.name.equalsIgnoreCase("ELLIPSOID")).flatMap { n =>
      n.numbers match {
        case Seq(a, invF, _*) => Some((a, invF))
        case _ => None
      }
    }

  /** Normalized parameter map: lowercased, non-alphanumerics stripped.
    * Covers OGC WKT-1, ESRI WKT-1, and WKT-2 parameter spellings. */
  private def params(root: Node): Map[String, Double] =
    root.all.filter(_.name.equalsIgnoreCase("PARAMETER")).flatMap { n =>
      val name = n.label
      n.numbers.headOption.map(v => canon(name) -> v)
    }.toMap

  private def canon(s: String): String =
    s.toLowerCase.filter(Character.isLetterOrDigit)

  private def param(p: Map[String, Double], names: String*): Option[Double] =
    names.iterator.map(canon).flatMap(p.get).nextOption()

  private def near(a: Double, b: Double, tol: Double): Boolean = math.abs(a - b) <= tol

  private val Wgs84InvF = 298.257223563
  private val Grs80InvF = 298.257222101

  /** Prime-meridian longitude in degrees east of Greenwich. Both GDAL and
    * ESRI write the PRIMEM value in DEGREES regardless of the GEOGCS
    * angular unit (the WKT-1 ambiguity resolved the conventional way). */
  private def primeMeridianDeg(root: Node): Double =
    root.all.find(_.name.equalsIgnoreCase("PRIMEM"))
      .flatMap(_.numbers.headOption).getOrElse(0.0)

  private def matchGeographic(root: Node): Either[String, String] =
    if (!near(primeMeridianDeg(root), 0.0, 1e-12))
      Left(s"geographic CRS '${root.label}' has a non-Greenwich prime " +
        "meridian — its coordinates are shifted and cannot snap to the hub")
    else ellipsoid(root) match {
      // WGS84, GRS80 (ETRS89/NAD83/RGF93) — all ride the hub's 4326
      case Some((a, invF)) if near(a, 6378137.0, 0.01) &&
        (near(invF, Wgs84InvF, 1e-6) || near(invF, Grs80InvF, 1e-6)) =>
        Right("EPSG:4326")
      case Some((a, invF)) =>
        Left(f"unsupported geographic CRS '${root.label}' (ellipsoid a=$a%.3f 1/f=$invF%.9f)")
      case None => Left(s"geographic CRS '${root.label}' has no SPHEROID/ELLIPSOID")
    }

  /** Metres per linear-coordinate unit: the UNIT node that is a DIRECT
    * child of the PROJCS root (US state-plane grids are in survey feet). */
  private def linearUnit(root: Node): Double =
    root.child("UNIT", "LENGTHUNIT").flatMap(_.numbers.headOption).getOrElse(1.0)

  /** Degrees per angular-parameter unit, from the base GEOGCS's UNIT node
    * (legacy French grids express parallels in grads). Every WKT in the
    * wild prints the degree factor truncated ("0.0174532925199433"), so a
    * factor within truncation distance of π/180 (or π/200 for grads) snaps
    * to the exact conversion — otherwise each parsed angle picks up an ulp
    * of error the authoring tool never intended. */
  private def angularUnitDeg(root: Node): Double =
    root.child("GEOGCS", "GEOGCRS", "BASEGEOGCRS")
      .flatMap(g => g.child("UNIT", "ANGLEUNIT"))
      .flatMap(_.numbers.headOption)
      .map { radPerUnit =>
        if (near(radPerUnit, math.Pi / 180.0, 1e-12)) 1.0
        else if (near(radPerUnit, math.Pi / 200.0, 1e-12)) 0.9
        else radPerUnit * 180.0 / math.Pi
      }
      .getOrElse(1.0)

  private def matchProjected(root: Node, allowSnap: Boolean): Either[String, String] = {
    // WKT-1: PROJECTION["name"]; WKT-2: CONVERSION[..., METHOD["name"[, ID]]]
    val method = root.all.find(_.name.equalsIgnoreCase("PROJECTION"))
      .orElse(root.all.find(_.name.equalsIgnoreCase("METHOD")))
      .map(_.label).getOrElse("")
    val m = canon(method)
    val p = params(root)
    val ell = ellipsoid(root)
    val datum = root.all.find(n => n.name.equalsIgnoreCase("DATUM") ||
      n.name.equalsIgnoreCase("BASEGEOGCRS")).map(_.label).getOrElse("")
    val angU = angularUnitDeg(root)
    val linU = linearUnit(root)
    val towgs = root.all.find(_.name.equalsIgnoreCase("TOWGS84")).map(_.numbers)

    // angles in degrees, lengths in metres, whatever the file's units;
    // a non-Greenwich PRIMEM (NTF's Paris) shifts the central meridian
    val pmDeg = primeMeridianDeg(root)
    def lon0 = param(p, "central_meridian", "longitude_of_natural_origin",
      "longitude_of_center", "longitude_of_origin", "longitude_of_false_origin")
      .map(_ * angU + pmDeg)
    def lat0 = param(p, "latitude_of_origin", "latitude_of_natural_origin",
      "latitude_of_center", "latitude_of_false_origin").map(_ * angU)
    def k0 = param(p, "scale_factor", "scale_factor_at_natural_origin")
    def fe = param(p, "false_easting", "easting_at_false_origin").map(_ * linU)
    def fn = param(p, "false_northing", "northing_at_false_origin").map(_ * linU)
    def sp1 = param(p, "standard_parallel_1", "latitude_of_1st_standard_parallel",
      "latitude_of_standard_parallel", "standard_parallel").map(_ * angU)
    def sp2 = param(p, "standard_parallel_2", "latitude_of_2nd_standard_parallel")
      .map(_ * angU)

    // --- parameter instantiation: a method the hub implements, with
    // parameters matching no known code, becomes a self-contained
    // "PARAM:FAM:..." definition (reference behavior: utils.py:397 accepts
    // any OGR SRS string). Datum must ride the WGS84 hub (WGS84/GRS80) or
    // carry a TOWGS84 shift — anything else would be silently kilometres off.
    def datumOk(a: Double, invF: Double): Either[String, Unit] =
      if (towgs.exists(_.nonEmpty)) Right(())
      else if (near(a, 6378137.0, 0.01) &&
        (near(invF, Wgs84InvF, 1e-6) || near(invF, Grs80InvF, 1e-6))) Right(())
      else Left(s"datum '$datum' of '${root.label}' has no TOWGS84 and is not " +
        "WGS84/GRS80 — no transform to the hub")

    def paramCode(fam: String, a: Double, invF: Double,
        kv: Seq[(String, Double)]): Either[String, String] = {
      val shift = towgs.filter(_.exists(_ != 0.0)).map { t =>
        val t7 = t.padTo(7, 0.0)
        Seq("DX" -> t7(0), "DY" -> t7(1), "DZ" -> t7(2),
          "RX" -> t7(3), "RY" -> t7(4), "RZ" -> t7(5), "DS" -> t7(6))
      }.getOrElse(Nil)
      val unit = if (near(linU, 1.0, 1e-12)) Nil else Seq("UNIT" -> linU)
      val code = s"PARAM:$fam:" + (Seq("A" -> a, "INVF" -> invF) ++ kv ++ unit ++ shift)
        .map { case (k, v) => s"$k=$v" }.mkString(";")
      if (Proj.paramSpec(code).isDefined) Right(code)
      else Left(s"could not instantiate $fam projection for '${root.label}'")
    }

    def inst(fam: String, kv: Seq[(String, Option[Double])],
        defaults: Map[String, Double] = Map.empty): Either[String, String] =
      ell match {
        case None => Left(s"projected CRS '${root.label}' has no SPHEROID/ELLIPSOID")
        case Some((a, invF)) => datumOk(a, invF).flatMap { _ =>
          val resolved = kv.map { case (k, v) =>
            k -> v.orElse(defaults.get(k))
          }
          resolved.collectFirst { case (k, None) => k } match {
            case Some(missing) =>
              Left(s"'${root.label}': required parameter $missing is absent")
            case None =>
              paramCode(fam, a, invF, resolved.map { case (k, v) => k -> v.get })
          }
        }
      }

    if (m.contains("transversemercator") || m.contains("gausskruger")) {
      val snapped: Option[String] = if (!allowSnap) None else
        (ell, lon0, lat0, k0, fe, fn) match {
          // UTM on WGS84 / GRS80: k0 0.9996, FE 500 km, lat0 0, λ0 = 6z−183
          case (Some((a, invF)), Some(l0), Some(la0), Some(k), Some(e), Some(n))
            if near(a, 6378137.0, 0.01) && near(k, 0.9996, 1e-9) &&
              near(e, 500000.0, 1e-3) && near(la0, 0.0, 1e-9) &&
              near((l0 + 183.0) / 6.0, math.round((l0 + 183.0) / 6.0).toDouble, 1e-9) &&
              math.round((l0 + 183.0) / 6.0) >= 1 && math.round((l0 + 183.0) / 6.0) <= 60 =>
            val zone = math.round((l0 + 183.0) / 6.0).toInt
            if (near(invF, Wgs84InvF, 1e-6) && near(n, 0.0, 1e-3))
              Some(f"EPSG:326$zone%02d")
            else if (near(invF, Wgs84InvF, 1e-6) && near(n, 10000000.0, 1e-3))
              Some(f"EPSG:327$zone%02d")
            else if (near(invF, Grs80InvF, 1e-6) && near(n, 0.0, 1e-3))
              Some(f"EPSG:258$zone%02d")
            else None
          // British National Grid on Airy 1830
          case (Some((a, _)), Some(l0), Some(la0), Some(k), Some(e), Some(n))
            if near(a, 6377563.396, 0.01) && near(l0, -2.0, 1e-9) &&
              near(la0, 49.0, 1e-9) && near(k, 0.9996012717, 1e-10) &&
              near(e, 400000.0, 1e-3) && near(n, -100000.0, 1e-3) =>
            Some("EPSG:27700")
          case _ => None
        }
      snapped.map(Right(_)).getOrElse(
        inst("TM", Seq("LON0" -> lon0, "LAT0" -> lat0, "K0" -> k0,
          "FE" -> fe, "FN" -> fn),
          defaults = Map("LAT0" -> 0.0, "K0" -> 1.0, "FE" -> 0.0, "FN" -> 0.0)))
    } else if (m.contains("stereographic") && !m.contains("polar") &&
      !m.contains("pole")) {
      // RD New: double/oblique stereographic on Bessel 1841 at Amersfoort.
      // (Arbitrary oblique stereographic needs the double-projection via the
      // conformal sphere — not instantiated from parameters here.)
      (ell, lat0) match {
        case (Some((a, _)), Some(la0))
          if near(a, 6377397.155, 0.01) && near(la0, 52.15616055555555, 1e-6) =>
          Right("EPSG:28992")
        case _ => Left(s"unsupported stereographic CRS '${root.label}'")
      }
    } else if (m.contains("polar") || m.contains("pole")) {
      // polar stereographic; ESRI spells the aspect in the method name
      // (Stereographic_South_Pole) and the true-scale latitude in
      // standard_parallel_1 (signed)
      val latTs = sp1.orElse(lat0)
      val south = latTs.exists(_ < 0) || m.contains("southpole")
      val snapped: Option[String] = if (!allowSnap) None else {
        val ts = latTs.getOrElse(Double.NaN)
        val zeroFalse = fe.forall(near(_, 0.0, 1e-3)) && fn.forall(near(_, 0.0, 1e-3))
        val l0 = lon0.getOrElse(Double.NaN)
        if (zeroFalse && near(ts, -71.0, 1e-9) && near(l0, 0.0, 1e-9)) Some("EPSG:3031")
        else if (zeroFalse && near(ts, 70.0, 1e-9) && near(l0, -45.0, 1e-9)) Some("EPSG:3413")
        else if (zeroFalse && near(ts, -70.0, 1e-9) && near(l0, 0.0, 1e-9)) Some("EPSG:3976")
        else if (zeroFalse && near(ts, 71.0, 1e-9) && near(l0, 0.0, 1e-9)) Some("EPSG:3995")
        else None
      }
      snapped.map(Right(_)).getOrElse {
        val southKv = Seq("SOUTH" -> Some(if (south) 1.0 else 0.0))
        if (latTs.exists(t => !near(math.abs(t), 90.0, 1e-9)))
          // variant B: a true-scale parallel off the pole
          inst("PS", Seq("SP1" -> latTs, "LON0" -> lon0,
            "FE" -> fe, "FN" -> fn) ++ southKv,
            defaults = Map("FE" -> 0.0, "FN" -> 0.0))
        else if (k0.isDefined)
          // variant A: origin at the pole, explicit scale factor
          inst("PS", Seq("K0" -> k0, "LON0" -> lon0,
            "FE" -> fe, "FN" -> fn) ++ southKv,
            defaults = Map("LON0" -> 0.0, "FE" -> 0.0, "FN" -> 0.0))
        else Left(s"unsupported polar stereographic CRS '${root.label}'")
      }
    } else if (m.contains("obliquemercator") || m.contains("swissoblique") ||
      m.contains("obliquecylindrical")) {
      // Swiss Oblique Mercator (EPSG 9814): GDAL/ESRI write CH1903 grids
      // as Hotine_Oblique_Mercator_Azimuth_Center with azimuth =
      // rectified grid angle = 90° and k0 = 1, to which 9814 is
      // equivalent. The general (non-90°) Hotine is not implemented.
      val az = param(p, "azimuth").map(_ * angU)
      val rga = param(p, "rectified_grid_angle").map(_ * angU)
      val swissLike = m.contains("swissoblique") || m.contains("obliquecylindrical") ||
        (az.forall(near(_, 90.0, 1e-9)) && rga.forall(near(_, 90.0, 1e-9)) &&
          k0.forall(near(_, 1.0, 1e-12)))
      if (!swissLike)
        Left(s"general Hotine Oblique Mercator in '${root.label}' is not " +
          "supported (only the Swiss azimuth-90 form, EPSG method 9814)")
      else
        inst("SOMERC", Seq("LAT0" -> lat0, "LON0" -> lon0,
          "FE" -> fe, "FN" -> fn),
          defaults = Map("FE" -> 0.0, "FN" -> 0.0))
    } else if (m.contains("mercator")) {
      // Spherical web mercator ONLY when the method says so
      // (Popular_Visualisation…, …_Auxiliary_Sphere) or the ellipsoid is an
      // explicit sphere. Plain Mercator_1SP/2SP on an ellipsoid — e.g.
      // EPSG:3395 World Mercator — is the ellipsoidal projection,
      // kilometres away from 3857 at mid latitudes.
      val spherical = m.contains("popularvisualisation") ||
        m.contains("auxiliarysphere") || m.contains("pseudo") ||
        ell.exists(_._2 == 0.0)
      if (spherical && ell.exists { case (a, _) => near(a, 6378137.0, 0.01) })
        Right("EPSG:3857")
      else if (spherical)
        Left(s"unsupported spherical Mercator CRS '${root.label}'")
      else if (sp1.isDefined) // 2SP (EPSG 9805): scale from the parallel
        inst("MERC", Seq("SP1" -> sp1, "LON0" -> lon0, "FE" -> fe, "FN" -> fn),
          defaults = Map("LON0" -> 0.0, "FE" -> 0.0, "FN" -> 0.0))
      else
        inst("MERC", Seq("K0" -> k0, "LON0" -> lon0, "FE" -> fe, "FN" -> fn),
          defaults = Map("K0" -> 1.0, "LON0" -> 0.0, "FE" -> 0.0, "FN" -> 0.0))
    } else if (m.contains("lambertconformalconic") || m.contains("lambertconicconformal")) {
      val snapped: Option[String] = if (!allowSnap) None else
        (sp1, sp2, lat0, lon0, fe, fn) match {
          case (Some(p1), Some(p2), Some(la0), Some(l0), Some(e), Some(n))
            if near(l0, 3.0, 1e-9) =>
            if (near(p1, 44.0, 1e-9) && near(p2, 49.0, 1e-9) &&
              near(la0, 46.5, 1e-9) && near(e, 700000.0, 1e-3) &&
              near(n, 6600000.0, 1e-3)) Some("EPSG:2154")
            else {
              // CC zone z (42..50): parallels z∓0.75, origin z, FE 1700 km,
              // FN (z−41)·1000 km + 200 km
              val z = math.round(la0).toInt
              if (z >= 42 && z <= 50 && near(la0, z.toDouble, 1e-9) &&
                near(p1, z - 0.75, 1e-9) && near(p2, z + 0.75, 1e-9) &&
                near(e, 1700000.0, 1e-3) && near(n, (z - 41) * 1000000.0 + 200000.0, 1e-3))
                Some(s"EPSG:${3900 + z}")
              else None
            }
          case _ => None
        }
      snapped.map(Right(_)).getOrElse {
        if (sp2.isEmpty || sp1 == sp2)
          // 1SP (EPSG 9801): single parallel = grid origin, explicit k0.
          // ESRI writes Standard_Parallel_1 + Scale_Factor; OGC 1SP .prj
          // carries only latitude_of_origin + scale_factor.
          inst("LCC", Seq("SP1" -> sp1.orElse(lat0), "LAT0" -> lat0.orElse(sp1),
            "K0" -> k0, "LON0" -> lon0, "FE" -> fe, "FN" -> fn),
            defaults = Map("K0" -> 1.0, "FE" -> 0.0, "FN" -> 0.0))
        else
          inst("LCC", Seq("SP1" -> sp1, "SP2" -> sp2, "LAT0" -> lat0.orElse(sp1),
            "LON0" -> lon0, "FE" -> fe, "FN" -> fn),
            defaults = Map("FE" -> 0.0, "FN" -> 0.0))
      }
    } else if (m.contains("albers")) {
      val snapped: Option[String] = if (!allowSnap) None else
        (sp1, sp2, lat0, lon0) match {
          case (Some(p1), Some(p2), Some(la0), Some(l0))
            if near(p1, 29.5, 1e-9) && near(p2, 45.5, 1e-9) &&
              near(la0, 23.0, 1e-9) && near(l0, -96.0, 1e-9) &&
              fe.forall(near(_, 0.0, 1e-3)) && fn.forall(near(_, 0.0, 1e-3)) =>
            Some("EPSG:5070")
          case _ => None
        }
      snapped.map(Right(_)).getOrElse(
        inst("AEA", Seq("SP1" -> sp1, "SP2" -> sp2, "LAT0" -> lat0,
          "LON0" -> lon0, "FE" -> fe, "FN" -> fn),
          defaults = Map("LAT0" -> 0.0, "FE" -> 0.0, "FN" -> 0.0)))
    } else if (m.isEmpty) {
      Left(s"projected CRS '${root.label}' (datum '$datum') has no PROJECTION/METHOD node")
    } else {
      Left(s"unsupported projection method '$method' in CRS '${root.label}'")
    }
  }

  // --- emission ------------------------------------------------------------

  /** OGC WKT-1 text for a supported EPSG code — what the sinks put in
    * `.prj` files and gpkg `definition` columns so foreign tools (QGIS,
    * ArcGIS, OGR) recover the CRS. Emitted strings round-trip through
    * [[toEpsg]] both via the AUTHORITY node and via parameter matching. */
  def toWkt(code: String): Option[String] = {
    val c = code.trim.toUpperCase
    if (c.startsWith("PARAM:")) return paramWkt(c)
    if (!c.startsWith("EPSG:")) return None

    def geogcs(name: String, datum: String, sphName: String, a: Double,
        invF: Double, towgs84: String = "", auth: String = ""): String =
      s"""GEOGCS["$name",DATUM["$datum",SPHEROID["$sphName",$a,$invF]$towgs84],""" +
        s"""PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]$auth]"""

    val wgs84 = geogcs("WGS 84", "WGS_1984", "WGS 84", 6378137.0, 298.257223563)
    val etrs89 = geogcs("ETRS89", "European_Terrestrial_Reference_System_1989",
      "GRS 1980", 6378137.0, 298.257222101)
    val rgf93 = geogcs("RGF93", "Reseau_Geodesique_Francais_1993",
      "GRS 1980", 6378137.0, 298.257222101)
    val nad83 = geogcs("NAD83", "North_American_Datum_1983",
      "GRS 1980", 6378137.0, 298.257222101)
    // TOWGS84 carries the published Helmert shifts so foreign tools apply
    // the same datum transform the hub uses (position-vector, toward WGS84)
    val osgb36 = geogcs("OSGB 1936", "OSGB_1936", "Airy 1830",
      6377563.396, 299.3249646,
      ",TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]")
    val amersfoort = geogcs("Amersfoort", "Amersfoort", "Bessel 1841",
      6377397.155, 299.1528128,
      ",TOWGS84[565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725]")

    def projcs(name: String, base: String, projection: String,
        params: Seq[(String, String)], epsg: Int): String =
      s"""PROJCS["$name",$base,PROJECTION["$projection"],""" +
        params.map { case (k, v) => s"""PARAMETER["$k",$v]""" }.mkString(",") +
        s""",UNIT["metre",1,AUTHORITY["EPSG","9001"]],AUTHORITY["EPSG","$epsg"]]"""

    val Utm = """EPSG:32([67])(\d\d)""".r
    val EtrsUtm = """EPSG:258(\d\d)""".r
    val FrCc = """EPSG:(394[2-9]|3950)""".r
    def tmParams(lat0: String, cm: String, k0: String, fe: String, fn: String) = Seq(
      "latitude_of_origin" -> lat0, "central_meridian" -> cm,
      "scale_factor" -> k0, "false_easting" -> fe, "false_northing" -> fn)

    c match {
      case "EPSG:4326" =>
        Some(geogcs("WGS 84", "WGS_1984", "WGS 84", 6378137.0, 298.257223563,
          auth = """,AUTHORITY["EPSG","4326"]"""))
      case "EPSG:3857" =>
        // EPSG method 1024's name, so the stripped-authority copy still
        // reads as the SPHERICAL pseudo-mercator (plain Mercator_1SP on an
        // ellipsoid is EPSG:3395 World Mercator, a different projection)
        Some(projcs("WGS 84 / Pseudo-Mercator", wgs84,
          "Popular_Visualisation_Pseudo_Mercator",
          tmParams("0", "0", "1", "0", "0"), 3857))
      case "EPSG:28992" =>
        Some(projcs("Amersfoort / RD New", amersfoort, "Oblique_Stereographic",
          tmParams("52.1561605555556", "5.38763888888889", "0.9999079",
            "155000", "463000"), 28992))
      case "EPSG:27700" =>
        Some(projcs("OSGB 1936 / British National Grid", osgb36,
          "Transverse_Mercator",
          tmParams("49", "-2", "0.9996012717", "400000", "-100000"), 27700))
      case Utm(hemi, zz) =>
        val z = zz.toInt
        if (z < 1 || z > 60) None
        else {
          val south = hemi == "7"
          Some(projcs(s"WGS 84 / UTM zone $z${if (south) "S" else "N"}", wgs84,
            "Transverse_Mercator",
            tmParams("0", (6 * z - 183).toString, "0.9996", "500000",
              if (south) "10000000" else "0"), c.stripPrefix("EPSG:").toInt))
        }
      case EtrsUtm(zz) =>
        val z = zz.toInt
        if (z < 1 || z > 60) None
        else Some(projcs(s"ETRS89 / UTM zone ${z}N", etrs89,
          "Transverse_Mercator",
          tmParams("0", (6 * z - 183).toString, "0.9996", "500000", "0"),
          25800 + z))
      case "EPSG:2154" =>
        Some(projcs("RGF93 / Lambert-93", rgf93, "Lambert_Conformal_Conic_2SP",
          Seq("standard_parallel_1" -> "44", "standard_parallel_2" -> "49",
            "latitude_of_origin" -> "46.5", "central_meridian" -> "3",
            "false_easting" -> "700000", "false_northing" -> "6600000"), 2154))
      case FrCc(code) =>
        val z = code.toInt - 3900 // 42..50
        Some(projcs(s"RGF93 / CC$z", rgf93, "Lambert_Conformal_Conic_2SP",
          Seq("standard_parallel_1" -> (z - 0.75).toString,
            "standard_parallel_2" -> (z + 0.75).toString,
            "latitude_of_origin" -> z.toString, "central_meridian" -> "3",
            "false_easting" -> "1700000",
            "false_northing" -> ((z - 41) * 1000000 + 200000).toString),
          code.toInt))
      case "EPSG:5070" =>
        Some(projcs("NAD83 / Conus Albers", nad83, "Albers_Conic_Equal_Area",
          Seq("standard_parallel_1" -> "29.5", "standard_parallel_2" -> "45.5",
            "latitude_of_center" -> "23", "longitude_of_center" -> "-96",
            "false_easting" -> "0", "false_northing" -> "0"), 5070))
      case "EPSG:3031" | "EPSG:3413" | "EPSG:3976" | "EPSG:3995" =>
        val (name, latTs, cm) = c match {
          case "EPSG:3031" => ("WGS 84 / Antarctic Polar Stereographic", "-71", "0")
          case "EPSG:3413" => ("WGS 84 / NSIDC Sea Ice Polar Stereographic North", "70", "-45")
          case "EPSG:3976" => ("WGS 84 / NSIDC Sea Ice Polar Stereographic South", "-70", "0")
          case _ => ("WGS 84 / Arctic Polar Stereographic", "71", "0")
        }
        Some(projcs(name, wgs84, "Polar_Stereographic",
          Seq("latitude_of_origin" -> latTs, "central_meridian" -> cm,
            "scale_factor" -> "1", "false_easting" -> "0",
            "false_northing" -> "0"), c.stripPrefix("EPSG:").toInt))
      case _ => None
    }
  }

  /** WKT-1 for a parameterized code, so sinks can still write `.prj` /
    * gpkg definitions for CRSs instantiated from foreign WKT. The output
    * round-trips through [[toEpsg]] back to an equivalent PARAM code. */
  private def paramWkt(code: String): Option[String] = {
    if (Proj.paramSpec(code).isEmpty) return None
    val parts = code.split(":", 3)
    val fam = parts(1)
    val kv = parts(2).split(";").iterator.map(_.split("=", 2))
      .map(a => a(0) -> a(1).toDouble).toMap
    val a = kv("A"); val invF = kv("INVF")
    val u = kv.getOrElse("UNIT", 1.0)
    def g(k: String, d: Double = 0.0): Double = kv.getOrElse(k, d)
    val towgs = if (kv.contains("DX"))
      s""",TOWGS84[${kv("DX")},${kv("DY")},${kv("DZ")},${g("RX")},${g("RY")},${g("RZ")},${g("DS")}]"""
    else ""
    val sphName =
      if (near(invF, Wgs84InvF, 1e-6)) "WGS 84"
      else if (near(invF, Grs80InvF, 1e-6)) "GRS 1980"
      else "unknown"
    val geogcs = s"""GEOGCS["GCS_unknown",DATUM["D_unknown",""" +
      s"""SPHEROID["$sphName",$a,$invF]$towgs],PRIMEM["Greenwich",0],""" +
      s"""UNIT["degree",0.0174532925199433]]"""
    // FE/FN are metres in the PARAM code but expressed in the CRS's linear
    // unit in WKT; angles are degrees in both
    def feU = g("FE") / u
    def fnU = g("FN") / u
    val projAndParams: Option[(String, Seq[(String, Double)])] = fam match {
      case "TM" => Some(("Transverse_Mercator", Seq(
        "latitude_of_origin" -> g("LAT0"), "central_meridian" -> g("LON0"),
        "scale_factor" -> g("K0", 1.0), "false_easting" -> feU,
        "false_northing" -> fnU)))
      case "LCC" if kv.contains("SP2") => Some(("Lambert_Conformal_Conic_2SP", Seq(
        "standard_parallel_1" -> kv("SP1"), "standard_parallel_2" -> kv("SP2"),
        "latitude_of_origin" -> g("LAT0", kv("SP1")),
        "central_meridian" -> g("LON0"),
        "false_easting" -> feU, "false_northing" -> fnU)))
      case "LCC" => Some(("Lambert_Conformal_Conic_1SP", Seq(
        "standard_parallel_1" -> kv("SP1"),
        "latitude_of_origin" -> g("LAT0", kv("SP1")),
        "scale_factor" -> g("K0", 1.0), "central_meridian" -> g("LON0"),
        "false_easting" -> feU, "false_northing" -> fnU)))
      case "AEA" => Some(("Albers_Conic_Equal_Area", Seq(
        "standard_parallel_1" -> kv("SP1"), "standard_parallel_2" -> kv("SP2"),
        "latitude_of_center" -> g("LAT0"), "longitude_of_center" -> g("LON0"),
        "false_easting" -> feU, "false_northing" -> fnU)))
      case "PS" =>
        val south = g("SOUTH") != 0.0
        if (kv.contains("K0")) Some(("Polar_Stereographic", Seq(
          "latitude_of_origin" -> (if (south) -90.0 else 90.0),
          "central_meridian" -> g("LON0"), "scale_factor" -> kv("K0"),
          "false_easting" -> feU, "false_northing" -> fnU)))
        else Some(("Polar_Stereographic", Seq(
          "latitude_of_origin" -> kv("SP1"), "central_meridian" -> g("LON0"),
          "false_easting" -> feU, "false_northing" -> fnU)))
      case "SOMERC" => Some(("Hotine_Oblique_Mercator_Azimuth_Center", Seq(
        "latitude_of_center" -> kv("LAT0"), "longitude_of_center" -> kv("LON0"),
        "azimuth" -> 90.0, "rectified_grid_angle" -> 90.0, "scale_factor" -> 1.0,
        "false_easting" -> feU, "false_northing" -> fnU)))
      case "MERC" =>
        if (kv.contains("SP1")) Some(("Mercator_2SP", Seq(
          "standard_parallel_1" -> kv("SP1"), "central_meridian" -> g("LON0"),
          "false_easting" -> feU, "false_northing" -> fnU)))
        else Some(("Mercator_1SP", Seq(
          "central_meridian" -> g("LON0"), "scale_factor" -> g("K0", 1.0),
          "false_easting" -> feU, "false_northing" -> fnU)))
      case _ => None
    }
    projAndParams.map { case (proj, ps) =>
      val unitNode = if (near(u, 1.0, 1e-12)) """UNIT["metre",1]"""
        else s"""UNIT["unit",$u]"""
      s"""PROJCS["graft_param_$fam",$geogcs,PROJECTION["$proj"],""" +
        ps.map { case (k, v) => s"""PARAMETER["$k",$v]""" }.mkString(",") +
        s",$unitNode]"
    }
  }
}
