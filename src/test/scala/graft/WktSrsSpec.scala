package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{Proj, WktSrs}

/** WKT SRS resolution: real-world `.prj` content in both dialects for every
  * family the Proj hub supports. The ESRI strings are what ArcGIS writes
  * (no AUTHORITY nodes, renamed projections/parameters); the OGC strings
  * are the EPSG registry WKT-1 flavor. */
class WktSrsSpec extends AnyFunSuite {

  private def epsg(wkt: String): String = Proj.normalize(wkt)

  // --- geographic ----------------------------------------------------------

  private val esriWgs84 =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  private val ogcWgs84 =
    """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]]"""

  test("WGS84 geographic resolves in both dialects") {
    assert(epsg(esriWgs84) == "EPSG:4326")
    assert(epsg(ogcWgs84) == "EPSG:4326")
    assert(Proj.supported(esriWgs84))
  }

  test("ETRS89 geographic (GRS80 ellipsoid, no authority) rides the hub") {
    val esriEtrs =
      """GEOGCS["GCS_ETRS_1989",DATUM["D_ETRS_1989",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""
    assert(epsg(esriEtrs) == "EPSG:4326")
  }

  // --- UTM -----------------------------------------------------------------

  private def esriUtm(zone: Int, south: Boolean): String = {
    val fn = if (south) 10000000.0 else 0.0
    val h = if (south) "S" else "N"
    s"""PROJCS["WGS_1984_UTM_Zone_$zone$h",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",$fn],PARAMETER["Central_Meridian",${6 * zone - 183}.0],PARAMETER["Scale_Factor",0.9996],PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]"""
  }

  test("ESRI UTM resolves by parameters, all zones, both hemispheres") {
    assert(epsg(esriUtm(31, south = false)) == "EPSG:32631")
    assert(epsg(esriUtm(1, south = false)) == "EPSG:32601")
    assert(epsg(esriUtm(60, south = true)) == "EPSG:32760")
    assert(epsg(esriUtm(33, south = true)) == "EPSG:32733")
  }

  test("OGC UTM with an AUTHORITY node short-circuits to the code") {
    val ogc =
      """PROJCS["WGS 84 / UTM zone 33S",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",15],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],PARAMETER["false_northing",10000000],UNIT["metre",1,AUTHORITY["EPSG","9001"]],AXIS["Easting",EAST],AXIS["Northing",NORTH],AUTHORITY["EPSG","32733"]]"""
    assert(epsg(ogc) == "EPSG:32733")
  }

  test("ETRS89 UTM (GRS80) resolves to the 258xx series") {
    val esri =
      """PROJCS["ETRS_1989_UTM_Zone_32N",GEOGCS["GCS_ETRS_1989",DATUM["D_ETRS_1989",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",9.0],PARAMETER["Scale_Factor",0.9996],PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]"""
    assert(epsg(esri) == "EPSG:25832")
  }

  // --- national grids ------------------------------------------------------

  test("British National Grid resolves from ESRI parameters") {
    val esri =
      """PROJCS["British_National_Grid",GEOGCS["GCS_OSGB_1936",DATUM["D_OSGB_1936",SPHEROID["Airy_1830",6377563.396,299.3249646]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",400000.0],PARAMETER["False_Northing",-100000.0],PARAMETER["Central_Meridian",-2.0],PARAMETER["Scale_Factor",0.9996012717],PARAMETER["Latitude_Of_Origin",49.0],UNIT["Meter",1.0]]"""
    assert(epsg(esri) == "EPSG:27700")
  }

  test("RD New resolves from the ESRI Double_Stereographic form") {
    val esri =
      """PROJCS["RD_New",GEOGCS["GCS_Amersfoort",DATUM["D_Amersfoort",SPHEROID["Bessel_1841",6377397.155,299.1528128]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Double_Stereographic"],PARAMETER["False_Easting",155000.0],PARAMETER["False_Northing",463000.0],PARAMETER["Central_Meridian",5.38763888888889],PARAMETER["Scale_Factor",0.9999079],PARAMETER["Latitude_Of_Origin",52.1561605555556],UNIT["Meter",1.0]]"""
    assert(epsg(esri) == "EPSG:28992")
    // OGC spells the projection Oblique_Stereographic
    val ogc =
      """PROJCS["Amersfoort / RD New",GEOGCS["Amersfoort",DATUM["Amersfoort",SPHEROID["Bessel 1841",6377397.155,299.1528128]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Oblique_Stereographic"],PARAMETER["latitude_of_origin",52.1561605555556],PARAMETER["central_meridian",5.38763888888889],PARAMETER["scale_factor",0.9999079],PARAMETER["false_easting",155000],PARAMETER["false_northing",463000],UNIT["metre",1]]"""
    assert(epsg(ogc) == "EPSG:28992")
  }

  // --- web mercator --------------------------------------------------------

  test("web mercator resolves from the ESRI auxiliary-sphere form") {
    val esri =
      """PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Mercator_Auxiliary_Sphere"],PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",0.0],PARAMETER["Standard_Parallel_1",0.0],PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]"""
    assert(epsg(esri) == "EPSG:3857")
  }

  // --- Lambert Conformal Conic ---------------------------------------------

  test("Lambert-93 and a CC zone resolve from parameters") {
    val esri2154 =
      """PROJCS["RGF_1993_Lambert_93",GEOGCS["GCS_RGF_1993",DATUM["D_RGF_1993",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic"],PARAMETER["False_Easting",700000.0],PARAMETER["False_Northing",6600000.0],PARAMETER["Central_Meridian",3.0],PARAMETER["Standard_Parallel_1",44.0],PARAMETER["Standard_Parallel_2",49.0],PARAMETER["Latitude_Of_Origin",46.5],UNIT["Meter",1.0]]"""
    assert(epsg(esri2154) == "EPSG:2154")
    val cc46 =
      """PROJCS["RGF93_CC46",GEOGCS["GCS_RGF_1993",DATUM["D_RGF_1993",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic"],PARAMETER["False_Easting",1700000.0],PARAMETER["False_Northing",5200000.0],PARAMETER["Central_Meridian",3.0],PARAMETER["Standard_Parallel_1",45.25],PARAMETER["Standard_Parallel_2",46.75],PARAMETER["Latitude_Of_Origin",46.0],UNIT["Meter",1.0]]"""
    assert(epsg(cc46) == "EPSG:3946")
  }

  // --- polar stereographic + Albers ----------------------------------------

  test("polar stereographic resolves in both dialects") {
    val esri3031 =
      """PROJCS["WGS_1984_Antarctic_Polar_Stereographic",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Stereographic_South_Pole"],PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",0.0],PARAMETER["Standard_Parallel_1",-71.0],UNIT["Meter",1.0]]"""
    assert(epsg(esri3031) == "EPSG:3031")
    val ogc3413 =
      """PROJCS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",70],PARAMETER["central_meridian",-45],PARAMETER["scale_factor",1],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    assert(epsg(ogc3413) == "EPSG:3413")
  }

  test("Conus Albers resolves from parameters") {
    val ogc5070 =
      """PROJCS["NAD83 / Conus Albers",GEOGCS["NAD83",DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Albers_Conic_Equal_Area"],PARAMETER["latitude_of_center",23],PARAMETER["longitude_of_center",-96],PARAMETER["standard_parallel_1",29.5],PARAMETER["standard_parallel_2",45.5],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    assert(epsg(ogc5070) == "EPSG:5070")
  }

  // --- WKT-2 ---------------------------------------------------------------

  test("WKT-2 PROJCRS resolves via the root ID node") {
    val wkt2 =
      """PROJCRS["WGS 84 / UTM zone 31N",BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],CONVERSION["UTM zone 31N",METHOD["Transverse Mercator",ID["EPSG",9807]],PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],PARAMETER["Longitude of natural origin",3,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],ID["EPSG",8805]],PARAMETER["False easting",500000,LENGTHUNIT["metre",1],ID["EPSG",8806]],PARAMETER["False northing",0,LENGTHUNIT["metre",1],ID["EPSG",8807]]],CS[Cartesian,2],AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]],ID["EPSG",32631]]"""
    assert(epsg(wkt2) == "EPSG:32631")
  }

  test("WKT-2 without a root ID still resolves by method + parameters") {
    val wkt2 =
      """PROJCRS["WGS 84 / UTM zone 31N",BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]]],CONVERSION["UTM zone 31N",METHOD["Transverse Mercator"],PARAMETER["Latitude of natural origin",0],PARAMETER["Longitude of natural origin",3],PARAMETER["Scale factor at natural origin",0.9996],PARAMETER["False easting",500000],PARAMETER["False northing",0]],CS[Cartesian,2]]"""
    assert(epsg(wkt2) == "EPSG:32631")
  }

  // --- transforms go end-to-end with raw WKT input -------------------------

  test("transform accepts raw WKT on either side, bit-identical to the code") {
    val (x1, y1) = Proj.transform(esriWgs84, "EPSG:28992", 5.38720621, 52.15517440)
    val (x2, y2) = Proj.transform("EPSG:4326", "EPSG:28992", 5.38720621, 52.15517440)
    assert(x1 == x2 && y1 == y2)
    val (e1, n1) = Proj.transform(ogcWgs84, esriUtm(31, south = false), 3.0, 0.0)
    assert(math.abs(e1 - 500000.0) < 1e-6 && math.abs(n1) < 1e-6)
  }

  // --- failure modes -------------------------------------------------------

  test("genuinely unsupported WKT fails loudly, naming the method") {
    val krovak =
      """PROJCS["S-JTSK / Krovak East North",GEOGCS["S-JTSK",DATUM["System_Jednotne_Trigonometricke_Site_Katastralni",SPHEROID["Bessel 1841",6377397.155,299.1528128]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Krovak"],PARAMETER["latitude_of_center",49.5],PARAMETER["longitude_of_center",24.8333333333333],PARAMETER["azimuth",30.2881397527778],PARAMETER["pseudo_standard_parallel_1",78.5],PARAMETER["scale_factor",0.9999],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    val e = intercept[IllegalArgumentException](Proj.normalize(krovak))
    assert(e.getMessage.contains("Krovak"))
    assert(!Proj.supported(krovak))
  }

  test("an unsupported authority code reports the code in the error") {
    // NAD27 UTM 15N: authority present but not a hub code, and the Clarke
    // 1866 ellipsoid matches no family
    val nad27 =
      """PROJCS["NAD27 / UTM zone 15N",GEOGCS["NAD27",DATUM["North_American_Datum_1927",SPHEROID["Clarke 1866",6378206.4,294.978698213898]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",-93],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],PARAMETER["false_northing",0],AUTHORITY["EPSG","26715"]]"""
    val e = intercept[IllegalArgumentException](Proj.normalize(nad27))
    assert(e.getMessage.contains("26715"))
  }

  test("malformed WKT fails loudly instead of passing through") {
    val e = intercept[IllegalArgumentException](Proj.normalize("""PROJCS["broken",PROJECTION["Transverse_Mercator"""))
    assert(e.getMessage.toLowerCase.contains("wkt"))
  }

  test("emitted WKT round-trips for every hub family, with and without AUTHORITY") {
    val codes = Seq("EPSG:4326", "EPSG:3857", "EPSG:28992", "EPSG:27700",
      "EPSG:32631", "EPSG:32733", "EPSG:25832", "EPSG:2154", "EPSG:3946",
      "EPSG:5070", "EPSG:3031", "EPSG:3413", "EPSG:3976", "EPSG:3995")
    for (code <- codes) {
      val wkt = WktSrs.toWkt(code).getOrElse(fail(s"no WKT emitted for $code"))
      // authority fast-path
      assert(Proj.normalize(wkt) == code, s"$code authority path")
      // parameter-matching path: strip every AUTHORITY node — what an
      // ESRI-flavored copy of the same CRS looks like
      val noAuth = wkt.replaceAll(""",AUTHORITY\["EPSG","\d+"\]""", "")
      assert(!noAuth.contains("AUTHORITY"))
      assert(Proj.normalize(noAuth) == code, s"$code parameter path")
    }
    // unresolvable input emits nothing
    assert(WktSrs.toWkt("EPSG:99999").isEmpty && WktSrs.toWkt("junk").isEmpty)
  }

  test("the shapefile sink writes WKT .prj foreign tools can read") {
    val dir = java.nio.file.Files.createTempDirectory("prj_wkt")
    val path = dir.resolve("t.shp").toString
    graft.geometry.Shapefile.write(path,
      Seq((graft.geometry.GeomFunctions.readWkt("POINT (155000 463000)"), Seq[Any](1L))),
      Seq(graft.geometry.Shapefile.DbfField("fid", 'N', 18, 0)), "EPSG:28992")
    val prj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.resolve("t.prj").toString)), "US-ASCII")
    assert(prj.startsWith("PROJCS[\"Amersfoort / RD New\""))
    assert(prj.contains("AUTHORITY[\"EPSG\",\"28992\"]"))
    // and the engine's own reader still resolves it to the code
    assert(graft.geometry.ShapefileSource(path).projection == "EPSG:28992")
  }

  test("a NAD83 UTM .prj with a foreign authority resolves via parameters") {
    // authority declares 26915 (not a hub code) but the GRS80 TM parameters
    // are the ETRS89-UTM math — grid-free NAD83≈WGS84 convention
    val nad83 =
      """PROJCS["NAD83 / UTM zone 15N",GEOGCS["NAD83",DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",-93],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],PARAMETER["false_northing",0],AUTHORITY["EPSG","26915"]]"""
    assert(epsg(nad83) == "EPSG:25815")
  }
}
