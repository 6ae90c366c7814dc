package graft.service

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.time.Instant
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.core.BlockRegistry
import graft.raster.{Bbox, RasterBlock, RasterRequest}

/** WMS-style rendering endpoint over serialized views — the reference's
  * service entry point (its WMS handler takes `layers=<json>` query params,
  * ipyleaflet_plugin.py:26-45; SURVEY §3.2). A GET like
  *
  *   /wms?layers=<url-encoded view JSON>&bbox=x1,y1,x2,y2&width=256
  *        &height=256&projection=EPSG:28992[&time=<ISO instant>]
  *
  * deserializes the JSON v2 view, evaluates the request through the engine
  * and renders the first frame as a grayscale PNG (nodata → transparent).
  * Styling is linear min/max normalization unless `vmin`/`vmax` are given.
  */
object WmsMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8765)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
          val png = render(params)
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
    server.start()
    this
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
        case g: graft.geometry.GeoParquetSource    => check(g.url)
        case g: graft.geometry.GeoJsonSource       => check(g.url)
        case t: graft.geometry.TableGeometrySource => check(t.path)
        case _                                     =>
      }
      b.children.foreach(walk)
    }
    walk(view)
  }

  private[service] def render(params: Map[String, String]): Array[Byte] = {
    val view = BlockRegistry.fromJson(params("layers")).asInstanceOf[RasterBlock]
    validateSourcePaths(view)
    val Array(x1, y1, x2, y2) = params("bbox").split(",").map(_.toDouble)
    val w = params.getOrElse("width", "256").toInt
    val h = params.getOrElse("height", "256").toInt
    val proj = params.getOrElse("projection", view.projection)
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
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      val argb =
        if (v == nd) 0 // transparent
        else {
          val g = math.max(0, math.min(255, ((v - vmin) / span * 255).toInt))
          0xff000000 | (g << 16) | (g << 8) | g
        }
      img.setRGB(i % w, i / w, argb)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
