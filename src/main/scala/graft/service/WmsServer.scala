package graft.service

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.time.Instant
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.core.BlockRegistry
import graft.raster.{Bbox, Proj, RasterBlock, RasterRequest}

/** WMS-style rendering endpoint over serialized views — the reference's
  * service entry point (its WMS handler takes `layers=<json>` query params,
  * ipyleaflet_plugin.py:26-45; SURVEY §3.2). A GET like
  *
  *   /wms?layers=<url-encoded view JSON>&bbox=x1,y1,x2,y2&width=256
  *        &height=256&projection=EPSG:28992[&time=<ISO instant>]
  *
  * deserializes the JSON v2 view, evaluates the request through the engine
  * and renders the first frame as a PNG (nodata → transparent). Styling is
  * linear min/max normalization unless `vmin`/`vmax` are given; `styles=`
  * selects the color ramp (`gray` default, `viridis`, `terrain`).
  * `request=GetCapabilities` returns a WMS 1.3.0 capabilities document
  * describing the dynamic-view contract.
  */
object WmsMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8765)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new WmsServer(spark, port).start()
    println(s"graft WMS listening on http://127.0.0.1:${server.boundPort}/wms")
    Thread.currentThread().join()
  }
}

object WmsServer {
  /** Directories whose files deserialized views may read, from
    * `SPARK_GRAFT_DATA_ROOTS` (colon-separated) plus the JVM temp dir
    * (sink round-trips). */
  def defaultDataRoots: Seq[String] =
    sys.env.get("SPARK_GRAFT_DATA_ROOTS").map(_.split(':').toSeq)
      .getOrElse(Seq("/root/testdata")) :+
      System.getProperty("java.io.tmpdir")

  /** Color ramps as RGB anchor stops, linearly interpolated over the
    * normalized [0, 1] value. `gray` keeps the original single-band look;
    * `viridis` anchors follow matplotlib's published endpoints/midpoints. */
  private val Ramps: Map[String, Array[Int]] = Map(
    "gray" -> Array(0x000000, 0xffffff),
    "viridis" -> Array(0x440154, 0x3b528b, 0x21918c, 0x5ec962, 0xfde725),
    "terrain" -> Array(0x333399, 0x0d7fe5, 0x00be90, 0xfcf356, 0x996645, 0xffffff))

  def rampNames: Seq[String] = Ramps.keys.toSeq.sorted

  /** Half the web-mercator world span (meters at the equator). */
  val MercHalf = 20037508.342789244

  /** `/tiles/{z}/{x}/{y}.png` → the GetMap params of that tile: the
    * standard XYZ scheme (origin top-left, y growing south). */
  private[service] def tileParams(path: String,
      prefix: String = "tiles"): Map[String, String] = {
    val parts = path.split("/").filter(_.nonEmpty)
    require(parts.length == 4 && parts(0) == prefix,
      s"tile path must be /$prefix/{z}/{x}/{y}.<ext>, got $path")
    val z = parts(1).toInt
    val x = parts(2).toInt
    val y = parts(3).replaceAll("\\.[A-Za-z0-9]+$", "").toInt
    require(z >= 0 && z <= 30, s"zoom $z out of range")
    val n = 1L << z
    require(x >= 0 && x < n && y >= 0 && y < n,
      s"tile ($x, $y) outside zoom $z")
    val span = 2 * MercHalf / n
    val x1 = -MercHalf + x * span
    val y2 = MercHalf - y * span
    Map("bbox" -> s"$x1,${y2 - span},${x1 + span},$y2",
      "width" -> "256", "height" -> "256", "projection" -> "EPSG:3857")
  }

  /** ARGB for normalized value `t` in [0, 1] under the named ramp. */
  def rampColor(name: String, t: Double): Int = {
    val stops = Ramps.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown style '$name' (${rampNames.mkString(", ")})"))
    val x = math.max(0.0, math.min(1.0, t)) * (stops.length - 1)
    val i = math.min(stops.length - 2, x.toInt)
    val f = x - i
    def ch(c: Int, shift: Int): Int = (c >> shift) & 0xff
    def mix(shift: Int): Int =
      math.round(ch(stops(i), shift) * (1 - f) + ch(stops(i + 1), shift) * f).toInt
    0xff000000 | (mix(16) << 16) | (mix(8) << 8) | mix(0)
  }
}

class WmsServer(spark: SparkSession, port: Int = 0,
    dataRoots: Seq[String] = WmsServer.defaultDataRoots) {

  private implicit val s: SparkSession = spark
  // loopback bind is deliberately non-configurable: the endpoint evaluates
  // client-supplied view JSON, so it must never listen on external interfaces
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  def start(): WmsServer = {
    server.createContext("/wms", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val params = parseQuery(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
          if (params.get("request").exists(_.equalsIgnoreCase("GetCapabilities"))) {
            val xml = capabilitiesXml.getBytes("UTF-8")
            ex.getResponseHeaders.set("Content-Type", "text/xml; charset=UTF-8")
            ex.sendResponseHeaders(200, xml.length)
            ex.getResponseBody.write(xml)
          } else if (params.get("request").exists(_.equalsIgnoreCase("GetFeatureInfo"))) {
            val (ctype, body) = featureInfo(params)
            ex.getResponseHeaders.set("Content-Type", ctype)
            ex.sendResponseHeaders(200, body.length)
            ex.getResponseBody.write(body)
          } else if (params.get("request").exists(_.equalsIgnoreCase("GetLegendGraphic"))) {
            val png = legendGraphic(params)
            ex.getResponseHeaders.set("Content-Type", "image/png")
            ex.sendResponseHeaders(200, png.length)
            ex.getResponseBody.write(png)
          } else {
            val png = render(params)
            ex.getResponseHeaders.set("Content-Type", "image/png")
            ex.sendResponseHeaders(200, png.length)
            ex.getResponseBody.write(png)
          }
        } catch {
          case e: Exception =>
            val msg = s"error: ${e.getMessage}".getBytes("UTF-8")
            ex.sendResponseHeaders(400, msg.length)
            ex.getResponseBody.write(msg)
        } finally ex.close()
      }
    })
    // XYZ/slippy-map tile endpoint (the de-facto WMTS of web maps, the
    // scheme ipyleaflet/leaflet consume): /tiles/{z}/{x}/{y}.png in
    // EPSG:3857, query params (layers=<view json>, styles, vmin/vmax,
    // time) as in GetMap. Same render path — a tile IS a GetMap with the
    // tile's mercator bbox, so caching/clients compose freely.
    server.createContext("/tiles", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val q = parseQuery(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
          if (ex.getRequestURI.getPath.stripSuffix("/") == "/tiles") {
            // TileJSON 2.2 descriptor (the public spec web clients use to
            // wire an XYZ layer): echoes the tile URL template with the
            // caller's query string
            val qs = Option(ex.getRequestURI.getRawQuery)
              .filter(_.nonEmpty).map("?" + _).getOrElse("")
            val doc = graft.core.Json.render(
              scala.collection.immutable.ListMap(
                "tilejson" -> "2.2.0",
                "tiles" -> Seq(s"http://127.0.0.1:$boundPort" +
                  s"/tiles/{z}/{x}/{y}.png$qs"),
                "minzoom" -> 0L, "maxzoom" -> 30L)).getBytes("UTF-8")
            ex.getResponseHeaders.set("Content-Type", "application/json")
            ex.sendResponseHeaders(200, doc.length)
            ex.getResponseBody.write(doc)
            return
          }
          val png = render(q ++ WmsServer.tileParams(
            ex.getRequestURI.getPath))
          ex.getResponseHeaders.set("Content-Type", "image/png")
          ex.sendResponseHeaders(200, png.length)
          ex.getResponseBody.write(png)
        } catch {
          case e: Exception =>
            val msg = s"error: ${e.getMessage}".getBytes("UTF-8")
            ex.sendResponseHeaders(400, msg.length)
            ex.getResponseBody.write(msg)
        } finally ex.close()
      }
    })
    // vector tiles: /features/{z}/{x}/{y}.json returns the features of a
    // serialized GEOMETRY view intersecting the tile, as an RFC 7946
    // FeatureCollection in EPSG:4326 — the layer a leaflet L.geoJSON
    // client consumes directly
    server.createContext("/features", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val q = parseQuery(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
          val body = featureTile(q ++ WmsServer.tileParams(
            ex.getRequestURI.getPath, "features"))
          ex.getResponseHeaders.set("Content-Type",
            "application/geo+json; charset=UTF-8")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        } catch {
          case e: Exception =>
            val msg = s"error: ${e.getMessage}".getBytes("UTF-8")
            ex.sendResponseHeaders(400, msg.length)
            ex.getResponseBody.write(msg)
        } finally ex.close()
      }
    })
    server.start()
    this
  }

  private[service] def featureTile(params: Map[String, String]): Array[Byte] = {
    val view = BlockRegistry.fromJson(params("layers"))
      .asInstanceOf[graft.geometry.GeometryBlock]
    validateSourcePaths(view)
    val Array(x1, y1, x2, y2) = params("bbox").split(",").map(_.toDouble)
    val vp = view.projection
    // corner-transform the mercator tile into the view's CRS (axis-aligned
    // envelope of the corners — the standard tile-request approximation)
    val cs = Seq((x1, y1), (x1, y2), (x2, y1), (x2, y2))
      .map { case (x, y) => Proj.transform("EPSG:3857", vp, x, y) }
    val wkt = s"POLYGON ((${cs.map(_._1).min} ${cs.map(_._2).min}, " +
      s"${cs.map(_._1).max} ${cs.map(_._2).min}, " +
      s"${cs.map(_._1).max} ${cs.map(_._2).max}, " +
      s"${cs.map(_._1).min} ${cs.map(_._2).max}, " +
      s"${cs.map(_._1).min} ${cs.map(_._2).min}))"
    val df = view.frame(graft.geometry.GeometryRequest(
      mode = "intersects", geometryWkt = Some(wkt), projection = vp))
    val tmp = java.nio.file.Files.createTempFile("vtile", ".json")
    try {
      graft.geometry.GeoJsonSink.writeStream(df, vp, tmp.toString)
      java.nio.file.Files.readAllBytes(tmp)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  def stop(): Unit = server.stop(0)

  private def parseQuery(q: String): Map[String, String] =
    q.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> URLDecoder.decode(v, "UTF-8")
    }.toMap

  /** Deserialized views name arbitrary filesystem paths in their source
    * blocks; refuse anything outside the configured data roots so an HTTP
    * client cannot read and render arbitrary process-readable files. */
  private def validateSourcePaths(view: graft.core.Block): Unit = {
    val roots = dataRoots.map(r =>
      java.nio.file.Paths.get(r).toAbsolutePath.normalize)
    def check(p: String): Unit = {
      val abs = java.nio.file.Paths.get(p).toAbsolutePath.normalize
      require(roots.exists(abs.startsWith),
        s"source path '$p' outside the configured data roots")
    }
    def walk(b: graft.core.Block): Unit = {
      b match {
        case t: graft.raster.TableRasterSource     => check(t.path)
        case r: graft.raster.RasterParquetSource   => check(r.url)
        case g: graft.raster.GeoTiffSource         => check(g.url)
        case g: graft.raster.AsciiGridSource       => check(g.url)
        case g: graft.raster.XyzSource             => check(g.url)
        case g: graft.raster.PngSource             => check(g.url)
        case g: graft.raster.EnviSource            => check(g.url)
        case g: graft.raster.NetCdfSource          => check(g.url)
        case g: graft.geometry.GeoParquetSource    => check(g.url)
        case g: graft.geometry.GeoJsonSource       => check(g.url)
        case t: graft.geometry.TableGeometrySource => check(t.path)
        case s: graft.geometry.ShapefileSource     => check(s.url)
        case s: graft.geometry.GeoPackageSource    => check(s.url)
        case s: graft.geometry.MifSource           => check(s.url)
        case s: graft.geometry.DxfSource           => check(s.url)
        case s: graft.geometry.GmlSource           => check(s.url)
        case s: graft.geometry.GeometryFileSource  => check(s.url)
        case s: graft.geometry.FlatGeobufSource    => check(s.url)
        case s: graft.geometry.CsvWktSource        => check(s.url)
        case s: graft.geometry.KmlSource           => check(s.url)
        case s: graft.geometry.GpxSource           => check(s.url)
        case _                                     =>
      }
      b.children.foreach(walk)
    }
    walk(view)
  }

  /** WMS 1.3.0 capabilities. Layers here are dynamic (client-supplied view
    * JSON), so the document advertises the endpoint contract and the one
    * wildcard layer, mirroring the reference's ipyleaflet plugin surface
    * (ipyleaflet_plugin.py:26-45). */
  private[service] def capabilitiesXml: String = {
    val host = s"http://127.0.0.1:$boundPort/wms"
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<WMS_Capabilities version="1.3.0" xmlns="http://www.opengis.net/wms">
       |  <Service>
       |    <Name>WMS</Name>
       |    <Title>graft dynamic view renderer</Title>
       |    <Abstract>Renders serialized graft raster views. Pass the view as
       |      the url-encoded 'layers' query parameter (JSON v2 graph).</Abstract>
       |    <OnlineResource xmlns:xlink="http://www.w3.org/1999/xlink" xlink:href="$host"/>
       |  </Service>
       |  <Capability>
       |    <Request>
       |      <GetCapabilities>
       |        <Format>text/xml</Format>
       |      </GetCapabilities>
       |      <GetMap>
       |        <Format>image/png</Format>
       |      </GetMap>
       |      <GetFeatureInfo>
       |        <Format>application/json</Format>
       |        <Format>text/plain</Format>
       |      </GetFeatureInfo>
       |      <GetLegendGraphic>
       |        <Format>image/png</Format>
       |      </GetLegendGraphic>
       |    </Request>
       |    <Layer>
       |      <Title>dynamic</Title>
       |      <Abstract>Any serialized graft view; styles: ${WmsServer.rampNames.mkString(", ")}</Abstract>
       |      <CRS>EPSG:28992</CRS>
       |      <CRS>EPSG:3857</CRS>
       |      <CRS>EPSG:4326</CRS>
       |      <CRS>EPSG:27700</CRS>
       |      <CRS>EPSG:2154</CRS>
       |      <CRS>EPSG:5070</CRS>
       |      <CRS>EPSG:3031</CRS>
       |      <CRS>EPSG:3413</CRS>
       |      <CRS>EPSG:25832</CRS>
       |      <CRS>EPSG:32631</CRS>
       |    </Layer>
       |  </Capability>
       |</WMS_Capabilities>
       |""".stripMargin
  }

  /** WMS 1.3.0 GetFeatureInfo: the engine value under GetMap pixel (i, j)
    * of the given view/bbox/size. The lookup is a point request (degenerate
    * bbox at the pixel center, 1×1 grid) — the engine's native point path,
    * so only that cell's frame evaluates, not the whole map tile. Accepts
    * the 1.1.1 `x`/`y` aliases; `info_format=application/json` (default) or
    * `text/plain`. */
  private[service] def featureInfo(params: Map[String, String]): (String, Array[Byte]) = {
    val viewJson = params.getOrElse("query_layers", params("layers"))
    val view = BlockRegistry.fromJson(viewJson).asInstanceOf[RasterBlock]
    validateSourcePaths(view)
    val Array(x1, y1, x2, y2) = params("bbox").split(",").map(_.toDouble)
    val w = params.getOrElse("width", "256").toInt
    val h = params.getOrElse("height", "256").toInt
    val i = params.get("i").orElse(params.get("x")).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("missing pixel column i"))
    val j = params.get("j").orElse(params.get("y")).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("missing pixel row j"))
    require(i >= 0 && i < w && j >= 0 && j < h,
      s"pixel ($i, $j) outside the ${w}x$h map")
    val px = x1 + (i + 0.5) * (x2 - x1) / w
    val py = y2 - (j + 0.5) * (y2 - y1) / h // row 0 is the top row
    val proj = params.get("projection").orElse(params.get("crs"))
      .orElse(params.get("srs")).getOrElse(view.projection)
    val time = params.get("time").map(Instant.parse)
    val res = view.getData(RasterRequest(Bbox(px, py, px, py), proj, 1, 1, time, time))
    val value: Option[Double] = res.flatMap { r =>
      val v = r.values.head.head
      if (v == r.noDataValue || v.isNaN) None else Some(v)
    }
    val at = res.flatMap(_.times.headOption)
    params.getOrElse("info_format", "application/json") match {
      case "text/plain" =>
        val lines = Seq(
          s"x: ${px}", s"y: ${py}",
          s"value: ${value.map(_.toString).getOrElse("nodata")}") ++
          at.map(t => s"time: $t")
        ("text/plain; charset=UTF-8", (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      case _ =>
        val json = "{\"x\":" + px + ",\"y\":" + py +
          ",\"value\":" + value.map(_.toString).getOrElse("null") +
          at.map(t => ",\"time\":\"" + t + "\"").getOrElse("") + "}"
        ("application/json", json.getBytes("UTF-8"))
    }
  }

  /** WMS GetLegendGraphic: a vertical color-ramp bar for the requested
    * style (top = max). Pure ramp evaluation — no view needed. */
  private[service] def legendGraphic(params: Map[String, String]): Array[Byte] = {
    val style = params.getOrElse("styles", params.getOrElse("style", "gray")) match {
      case "" => "gray"
      case s  => s
    }
    val w = params.getOrElse("width", "20").toInt
    val h = params.getOrElse("height", "200").toInt
    require(w > 0 && h > 0 && w <= 2048 && h <= 2048, s"legend size ${w}x$h out of range")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < h) {
      val t = if (h == 1) 1.0 else 1.0 - y.toDouble / (h - 1) // row 0 = max
      val argb = WmsServer.rampColor(style, t)
      var x = 0
      while (x < w) { img.setRGB(x, y, argb); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private[service] def render(params: Map[String, String]): Array[Byte] = {
    val view = BlockRegistry.fromJson(params("layers")).asInstanceOf[RasterBlock]
    validateSourcePaths(view)
    val Array(x1, y1, x2, y2) = params("bbox").split(",").map(_.toDouble)
    val w = params.getOrElse("width", "256").toInt
    val h = params.getOrElse("height", "256").toInt
    val proj = params.get("projection").orElse(params.get("crs"))
      .orElse(params.get("srs")).getOrElse(view.projection)
    val time = params.get("time").map(Instant.parse)
    val req = RasterRequest(Bbox(x1, y1, x2, y2), proj, w, h,
      time, time)
    val res = view.getData(req).getOrElse(
      throw new IllegalArgumentException("empty result for requested range"))
    val vals = res.values.head
    val nd = res.noDataValue
    val data = vals.filter(_ != nd)
    val vmin = params.get("vmin").map(_.toDouble)
      .getOrElse(if (data.isEmpty) 0.0 else data.min)
    val vmax = params.get("vmax").map(_.toDouble)
      .getOrElse(if (data.isEmpty) 1.0 else data.max)
    val span = math.max(vmax - vmin, 1e-12)
    val style = params.getOrElse("styles", "gray") match {
      case "" => "gray" // WMS clients send styles= for the default style
      case s  => s
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      val argb =
        if (v == nd) 0 // transparent
        else WmsServer.rampColor(style, (v - vmin) / span)
      img.setRGB(i % w, i / w, argb)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
