package graft

import java.net.{HttpURLConnection, URL, URLEncoder}
import graft.service.WmsServer
import graft.raster._
import RasterFixtures._

class WmsSpec extends SparkSpec {

  test("the WMS endpoint renders a serialized view as PNG over HTTP") {
    val server = new WmsServer(spark).start()
    try {
      val view = Multiply(source, 10)
      val layers = URLEncoder.encode(view.toJson, "UTF-8")
      val url = new URL(s"http://127.0.0.1:${server.boundPort}/wms?layers=$layers" +
        "&bbox=135000,455995,135005,456000&width=10&height=10" +
        "&projection=EPSG:28992&time=2000-01-01T01:00:00Z&vmin=0&vmax=255")
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 200)
      assert(conn.getContentType == "image/png")
      val bytes = conn.getInputStream.readAllBytes()
      // PNG magic
      assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == 10 && img.getHeight == 10)
      // frame at 01:00 has value 7 → ×10 = 70 → gray 70/255*255 = 70
      assert((img.getRGB(5, 5) & 0xff) == 70)

      // probe: an out-of-period time yields a clean 400, not a hang
      val bad = new URL(s"http://127.0.0.1:${server.boundPort}/wms?layers=$layers" +
        "&bbox=135000,455995,135005,456000&time=2015-01-01T00:00:00Z")
        .openConnection().asInstanceOf[HttpURLConnection]
      assert(bad.getResponseCode == 400)
    } finally server.stop()
  }
}
