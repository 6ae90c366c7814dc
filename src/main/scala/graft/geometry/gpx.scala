package graft.geometry

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LineString, MultiLineString, MultiPoint, Point}

/** GPX 1.1 codec (the public Topografix schema, the format every GPS
  * device and fitness service exchanges) — the `.gpx` branch of the
  * reference's OGR-backed `GeometryFileSource`/`to_file`
  * (geometry/sources.py:18-159; OGR exposes GPX as waypoints/tracks
  * layers).
  *
  * GPX is WGS84 lat/lon BY SPECIFICATION (`lat`/`lon` attributes, schema
  * 1.1): the sink reprojects on write and the source always reports
  * EPSG:4326 — the same contract as the KML codec. Two layers exist:
  * `waypoints` (`<wpt>` → Point) and `tracks` (`<trk>` → LineString, one
  * `<trkseg>`; MultiLineString over several). Standard GPX children
  * (`ele`, `time`, `name`, `cmt`, `desc`, `src`, `sym`, `type`) map to
  * columns; any other column rides in `<extensions>` under a `graft:`
  * prefix, where the fid also persists (GPX itself has no feature id).
  *
  * The reader splits the document on `</wpt>`/`</trk>` via the text
  * source's `lineSep`, so element parsing is a narrow executor-side map
  * over the distributed text scan — the same scale shape as the GML and
  * KML readers. Polygons have no GPX representation and fail loudly
  * (OGR's driver drops them silently; loud beats silent).
  */
object Gpx {

  /** Standard GPX wpt/trk children in XSD sequence order; ele/time first
    * (wpt), the descriptive block after. `ele` is the one double. */
  val StdFields: Seq[(String, String)] = Seq(
    "ele" -> "double", "time" -> "string", "name" -> "string",
    "cmt" -> "string", "desc" -> "string", "src" -> "string",
    "sym" -> "string", "type" -> "string")
  private val stdOrder = StdFields.map(_._1)
  private val stdSet = stdOrder.toSet

  private val inputFactory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f
    }
  }

  private def localName(r: XMLStreamReader): String = {
    val n = r.getLocalName
    val i = n.indexOf(':')
    if (i >= 0) n.substring(i + 1) else n
  }

  private val gf = new GeometryFactory()

  // ---------------------------------------------------------------- read

  /** Head sample → (name, spark type): standard children actually present
    * plus `graft:`-style extension fields (strings), standard order first. */
  def headFields(head: String, layer: String): Seq[(String, String)] = {
    val scope = layer match {
      case "tracks" => head
      case _        => head
    }
    val present = stdOrder.filter(n => scope.contains(s"<$n>"))
    val ext = """<(?:\w+:)?(\w+)>""".r.findAllMatchIn(
      """(?s)<extensions>(.*?)</extensions>""".r.findAllMatchIn(scope)
        .map(_.group(1)).mkString("\n")).map(_.group(1)).toSeq.distinct
      .filterNot(n => n == "fid" || stdSet.contains(n))
    present.map(n => n -> StdFields.toMap.apply(n)) ++
      ext.sorted.map(n => n -> "string")
  }

  /** One `<wpt>` chunk → Point feature. */
  def parseWpt(chunk: String): Gml.Feature = {
    val start = "<wpt[\\s>]".r.findFirstMatchIn(chunk).map(_.start).getOrElse(
      throw new IllegalArgumentException("chunk without a wpt"))
    val body = chunk.substring(start).trim
    val xml = if (body.endsWith("</wpt>")) body else body + "</wpt>"
    val r = inputFactory.get.createXMLStreamReader(new StringReader(xml))
    try {
      var fid = -1L
      var geom: Geometry = null
      val attrs = Map.newBuilder[String, String]
      var inExt = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            localName(r) match {
              case "wpt" =>
                val lat = r.getAttributeValue(null, "lat").toDouble
                val lon = r.getAttributeValue(null, "lon").toDouble
                geom = gf.createPoint(new Coordinate(lon, lat))
              case "extensions" => inExt = true
              case n if inExt =>
                val v = r.getElementText
                if (n == "fid") v.toLongOption.foreach(fid = _)
                else attrs += n -> v
              case n if stdSet.contains(n) => attrs += n -> r.getElementText
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT if localName(r) == "extensions" =>
            inExt = false
          case _ => ()
        }
      }
      Gml.Feature(fid,
        if (geom == null) null else GeomFunctions.writeWkb(geom), attrs.result())
    } finally r.close()
  }

  /** One `<trk>` chunk → LineString (single `<trkseg>`) or MultiLineString
    * feature; track-level standard children + extensions as attrs. */
  def parseTrk(chunk: String): Gml.Feature = {
    val start = "<trk[\\s>]".r.findFirstMatchIn(chunk).map(_.start).getOrElse(
      throw new IllegalArgumentException("chunk without a trk"))
    val body = chunk.substring(start).trim
    val xml = if (body.endsWith("</trk>")) body else body + "</trk>"
    val r = inputFactory.get.createXMLStreamReader(new StringReader(xml))
    try {
      var fid = -1L
      val attrs = Map.newBuilder[String, String]
      var inExt = false
      var inSeg = false
      val segs = scala.collection.mutable.ArrayBuffer[Array[Coordinate]]()
      val cur = scala.collection.mutable.ArrayBuffer[Coordinate]()
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            localName(r) match {
              case "trkseg" => inSeg = true; cur.clear()
              case "trkpt" if inSeg =>
                cur += new Coordinate(
                  r.getAttributeValue(null, "lon").toDouble,
                  r.getAttributeValue(null, "lat").toDouble)
              case "extensions" if !inSeg => inExt = true
              case n if inExt =>
                val v = r.getElementText
                if (n == "fid") v.toLongOption.foreach(fid = _)
                else attrs += n -> v
              case n if !inSeg && stdSet.contains(n) =>
                attrs += n -> r.getElementText
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            localName(r) match {
              case "trkseg" => inSeg = false; segs += cur.toArray
              case "extensions" => inExt = false
              case _ => ()
            }
          case _ => ()
        }
      }
      val geom: Geometry =
        if (segs.isEmpty) null
        else if (segs.size == 1) gf.createLineString(segs.head)
        else gf.createMultiLineString(segs.map(gf.createLineString).toArray)
      Gml.Feature(fid,
        if (geom == null) null else GeomFunctions.writeWkb(geom), attrs.result())
    } finally r.close()
  }
}

/** Streaming single-file GPX export: reprojects to EPSG:4326, writes
  * Points as `<wpt>` and Line geometries as `<trk>` via a fid-ordered
  * `toLocalIterator`. GPX's schema sequence demands all waypoints before
  * all tracks, so track elements spool to a temp file during the single
  * pass and append at the end — driver memory stays bounded by one Spark
  * partition regardless of the point/line mix. */
object GpxSink {

  def writeStream(df0: DataFrame, proj: String, gpxPath: String)
      (implicit spark: SparkSession): String = {
    require(df0.columns.contains("geometry"), "GPX export needs a geometry column")
    val attrCols = df0.columns.filterNot(c => c == "geometry" || c == "fid").toSeq
    val fidIdx = df0.columns.indexOf("fid")
    val geomIdx = df0.columns.indexOf("geometry")
    val from = graft.raster.Proj.normalize(proj)
    val (stdCols, extCols) =
      attrCols.partition(c => Gpx.StdFields.exists(_._1 == c))
    val stdOrdered = Gpx.StdFields.map(_._1).filter(stdCols.contains)
    val ordered = if (fidIdx >= 0) df0.orderBy(col("fid")) else df0

    def valueOf(r: org.apache.spark.sql.Row, c: String): Option[String] = {
      val i = df0.columns.indexOf(c)
      if (i < 0 || r.isNullAt(i)) None
      else Some(r.get(i) match {
        case ts: java.sql.Timestamp => ts.toInstant.toString
        case other => other.toString
      })
    }
    def childrenXml(r: org.apache.spark.sql.Row, fid: Long): String = {
      val sb = new StringBuilder
      stdOrdered.foreach(c => valueOf(r, c).foreach(v =>
        sb.append(s"<$c>${Gml.escape(v)}</$c>")))
      sb.append(s"<extensions><graft:fid>$fid</graft:fid>")
      extCols.foreach(c => valueOf(r, c).foreach(v =>
        sb.append(s"<graft:$c>${Gml.escape(v)}</graft:$c>")))
      sb.append("</extensions>")
      sb.toString
    }
    def tf(c: Coordinate): (Double, Double) =
      if (from == "EPSG:4326") (c.x, c.y)
      else graft.raster.Proj.transform(from, "EPSG:4326", c.x, c.y)

    val trkSpool = java.nio.file.Files.createTempFile("graft_gpx_trk", ".xml")
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(gpxPath), "UTF-8"))
    val tw = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(trkSpool.toFile), "UTF-8"))
    try {
      w.write("<?xml version=\"1.0\" encoding=\"utf-8\" ?>\n")
      w.write("<gpx version=\"1.1\" creator=\"graft\" " +
        "xmlns=\"http://www.topografix.com/GPX/1/1\" " +
        "xmlns:graft=\"urn:graft:gpx:extensions\">\n")
      val it = ordered.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val fid = if (fidIdx >= 0 && !r.isNullAt(fidIdx))
          Gml.fidValue(r.get(fidIdx)) else -1L
        val wkb = if (geomIdx >= 0 && !r.isNullAt(geomIdx))
          r.get(geomIdx).asInstanceOf[Array[Byte]] else null
        val g = if (wkb == null) null else GeomFunctions.readWkb(wkb)
        g match {
          case null => ()
          case p: Point =>
            val (lon, lat) = tf(p.getCoordinate)
            w.write(s"""<wpt lat="${Gml.fmt(lat)}" lon="${Gml.fmt(lon)}">""" +
              childrenXml(r, fid) + "</wpt>\n")
          case mp: MultiPoint =>
            // GPX has no multipoint: one wpt per part, shared attrs/fid
            (0 until mp.getNumGeometries).foreach { i =>
              val (lon, lat) = tf(mp.getGeometryN(i).asInstanceOf[Point].getCoordinate)
              w.write(s"""<wpt lat="${Gml.fmt(lat)}" lon="${Gml.fmt(lon)}">""" +
                childrenXml(r, fid) + "</wpt>\n")
            }
          case l: LineString => writeTrk(tw, Seq(l), r, fid, childrenXml, tf)
          case ml: MultiLineString =>
            writeTrk(tw, (0 until ml.getNumGeometries)
              .map(ml.getGeometryN(_).asInstanceOf[LineString]), r, fid,
              childrenXml, tf)
          case other => throw new IllegalArgumentException(
            s"GPX cannot represent ${other.getGeometryType} (fid $fid)")
        }
      }
      tw.flush(); tw.close()
      val spooled = java.nio.file.Files.readString(trkSpool)
      if (spooled.nonEmpty) w.write(spooled)
      w.write("</gpx>\n")
    } finally {
      w.close()
      try tw.close() catch { case _: Throwable => () }
      java.nio.file.Files.deleteIfExists(trkSpool)
    }
    gpxPath
  }

  private def writeTrk(tw: java.io.Writer, segs: Seq[LineString],
      r: org.apache.spark.sql.Row, fid: Long,
      children: (org.apache.spark.sql.Row, Long) => String,
      tf: Coordinate => (Double, Double)): Unit = {
    tw.write("<trk>" + children(r, fid))
    segs.foreach { seg =>
      tw.write("<trkseg>")
      seg.getCoordinates.foreach { c =>
        val (lon, lat) = tf(c)
        tw.write(s"""<trkpt lat="${Gml.fmt(lat)}" lon="${Gml.fmt(lon)}"></trkpt>""")
      }
      tw.write("</trkseg>")
    }
    tw.write("</trk>\n")
  }
}

/** Distributed GPX reader: always EPSG:4326 (the GPX datum); `layer`
  * selects `waypoints` (default) or `tracks`; schema from a head sample;
  * element parsing a narrow map over a `</wpt>`/`</trk>`-split text scan. */
case class GpxSource(url: String, layer: String = "waypoints")
    extends GeometryBlock {
  require(layer == "waypoints" || layer == "tracks",
    s"GPX layer must be waypoints or tracks, got '$layer'")

  @transient private lazy val fields: Seq[(String, String)] = {
    val f = new java.io.File(url)
    if (!f.isFile) Seq.empty
    else {
      val in = new java.io.FileInputStream(f)
      val head = try new String(in.readNBytes(256 << 10), "UTF-8") finally in.close()
      Gpx.headFields(head, layer)
    }
  }

  override lazy val columns: Set[String] =
    fields.map(_._1).toSet + "geometry" + "fid"

  override def projection: String = "EPSG:4326"

  override def frame(req: GeometryRequest)(implicit spark: SparkSession): DataFrame = {
    val isTracks = layer == "tracks"
    val parse = udf { (chunk: String) =>
      val f = if (isTracks) Gpx.parseTrk(chunk) else Gpx.parseWpt(chunk)
      (f.fid, f.wkb, f.attrs)
    }
    val (sep, marker) =
      if (isTracks) ("</trk>", "<trk[\\s>]") else ("</wpt>", "<wpt[\\s>]")
    var df = spark.read.option("lineSep", sep).text(url)
      .filter(regexp_like(col("value"), lit(marker)))
      .select(parse(col("value")).as("f"))
      .select((Seq(col("f._1").as("fid"), col("f._2").as("geometry")) ++
        fields.map { case (n, t) => col("f._3")(n).cast(t).as(n) }): _*)
    req.geometryWkt.foreach { wkt =>
      df = df.filter(GeomFunctions.stFilter(col("geometry"), lit(wkt),
        lit(if (req.mode == "centroid") "centroid" else "intersects")))
    }
    req.filters.foreach { case (k, v) => df = df.filter(col(k) === lit(v)) }
    req.minSize.foreach(ms =>
      df = df.filter(GeomFunctions.stSizeAtLeast(col("geometry"), lit(ms))))
    req.limit.foreach(n => df = df.limit(n))
    df
  }
}
