package graft.geometry

import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

/** Zipped vector containers: `.kmz` (a zip holding `doc.kml`, OGC KML 2.2
  * §5.2) and `.zip` shapefile/vector bundles — both everyday currency in
  * the wild, which the reference opens through OGR's /vsizip/ virtual
  * filesystem (geometry/sources.py:18-159 accepts any OGR url). Here the
  * archive is extracted once per (path, mtime, size) into a temp
  * directory and the contained dataset dispatches through the normal
  * extension codecs.
  *
  * Safety: entry paths are confined to the extraction root (zip-slip),
  * and the total inflated size is capped — a zip bomb fails loudly
  * instead of filling the disk. */
object ZipVector {

  /** Total inflated bytes allowed per archive (matches the single-file
    * sink scale documented for the streaming codecs). */
  val MaxInflatedBytes: Long = 8L << 30

  private val extracted =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  /** Extract the archive (memoized) and return the primary vector file
    * inside: `.kmz` → the first `.kml` (conventionally doc.kml); `.zip` →
    * the first `.shp`, else the first file with a known vector extension. */
  def primaryFile(url: String): String = {
    import graft.io.FileIO
    require(FileIO.exists(url) && !FileIO.isDirectory(url),
      s"no such archive: $url")
    // memo key: size stands in for mtime on object stores (immutable
    // objects by convention; local files also carry lastModified)
    val mtime = if (FileIO.hasScheme(url)) 0L
      else new java.io.File(url).lastModified
    val key = s"$url|$mtime|${FileIO.size(url)}"
    val dir = extracted.computeIfAbsent(key, _ => extract(url))
    val names = Files.list(dir).iterator()
    val all = new scala.collection.mutable.ArrayBuffer[Path]()
    while (names.hasNext) all += names.next()
    val sorted = all.sortBy(_.getFileName.toString.toLowerCase)
    def byExt(ext: String): Option[Path] =
      sorted.find(_.getFileName.toString.toLowerCase.endsWith(ext))
    val primary =
      if (url.toLowerCase.endsWith(".kmz")) byExt(".kml")
      else byExt(".shp").orElse(Seq(".gpkg", ".geojson", ".json", ".gml",
        ".fgb", ".csv", ".kml").view.flatMap(byExt).headOption)
    primary.getOrElse(throw new IllegalArgumentException(
      s"archive $url contains no recognized vector dataset " +
        s"(entries: ${sorted.map(_.getFileName).mkString(", ")})")).toString
  }

  private def extract(url: String): Path = {
    val root = Files.createTempDirectory("graft_zip")
    // ZipFile needs random access on a LOCAL file: a scheme-qualified
    // archive is fetched once into a temp copy (zipped containers are
    // bounded by the single-file exchange contract)
    val localZip =
      if (graft.io.FileIO.hasScheme(url)) {
        val t = Files.createTempFile("graft_zip_src", ".zip")
        val in = graft.io.FileIO.openStream(url)
        try Files.copy(in, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        t.toString
      } else url
    val zf = new ZipFile(localZip)
    try {
      var total = 0L
      val entries = zf.entries()
      while (entries.hasMoreElements) {
        val e = entries.nextElement()
        if (!e.isDirectory) {
          // flatten to basenames: shapefile sidecars must live next to
          // the .shp regardless of folder structure inside the archive
          val name = Paths.get(e.getName).getFileName.toString
          require(!name.isEmpty && !name.contains(".."),
            s"archive $url has an unsafe entry name '${e.getName}'")
          val target = root.resolve(name).normalize()
          require(target.startsWith(root),
            s"archive $url entry '${e.getName}' escapes the extraction root")
          val in = zf.getInputStream(e)
          val out = Files.newOutputStream(target)
          try {
            val buf = new Array[Byte](1 << 16)
            var n = in.read(buf)
            while (n > 0) {
              total += n
              require(total <= MaxInflatedBytes,
                s"archive $url inflates past ${MaxInflatedBytes} bytes")
              out.write(buf, 0, n)
              n = in.read(buf)
            }
          } finally { in.close(); out.close() }
        }
      }
      root
    } finally zf.close()
  }

  /** Write `file` into a fresh zip archive at `zipPath` under `entryName`
    * (the `.kmz` writer: doc.kml). */
  def writeSingle(zipPath: String, entryName: String, file: String): String = {
    val out = new ZipOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(zipPath)))
    try {
      out.putNextEntry(new ZipEntry(entryName))
      val in = new java.io.BufferedInputStream(new java.io.FileInputStream(file))
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      out.closeEntry()
      zipPath
    } finally out.close()
  }
}
