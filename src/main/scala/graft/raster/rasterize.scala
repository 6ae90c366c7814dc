package graft.raster

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geometry.{GeometryBlock, GeometryRequest, GeomFunctions}

/** Geometry→raster blocks, after `dask_geomodeling/raster/misc.py:518-830`.
  *
  * The burn rule is the reference's cell-center test (utils.py:638-756): a
  * cell takes a feature's value iff its center lies inside the geometry;
  * overlapping features paint in iteration order, so the *last* (highest
  * fid) wins.
  */

/** Single literal WKT → boolean mask raster (misc.py:712-830). */
case class RasterizeWKT(wkt: String, proj: String) extends RasterBlock {
  override def dtype: DType = DType.Bool
  override def projection: String = proj
  override def temporal: Boolean = false
  override def timeDeltaMs: Option[Long] = None
  override def period: Option[(Instant, Instant)] =
    Some((Instant.EPOCH, Instant.EPOCH))
  override def extent: Option[Bbox] = {
    val e = GeomFunctions.readWkt(wkt).getEnvelopeInternal
    Some(Bbox(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))
  }
  override def allTimes: Seq[Instant] = Seq(Instant.EPOCH)

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val w = wkt
    val r = req
    // per-task prepared geometry via a lazily-initialized thread-local
    RasterFrames.generate(req, Seq(Instant.EPOCH), (t, ty, tx) => {
      val geom = org.locationtech.jts.geom.prep.PreparedGeometryFactory
        .prepare(GeomFunctions.readWkt(w))
      val f = new org.locationtech.jts.geom.GeometryFactory()
      val tw = TileLayout.tileW(r.width, tx)
      val th = TileLayout.tileH(r.height, ty)
      val out = new Array[Double](tw * th)
      var i = 0
      while (i < th) {
        val cy = r.cellCenterY(ty * TileLayout.TILE + i)
        var j = 0
        while (j < tw) {
          val cx = r.cellCenterX(tx * TileLayout.TILE + j)
          out(i * tw + j) =
            if (geom.contains(f.createPoint(
              new org.locationtech.jts.geom.Coordinate(cx, cy)))) 1.0 else 0.0
          j += 1
        }
        i += 1
      }
      out
    })
  }
}

/** Burn a GeometryBlock into a raster: `columnName` values, or a boolean
  * presence mask when None (misc.py:518-709). Distributed as a grid-key
  * equi-join of cells×features (same pattern as zonal statistics) — no
  * per-feature driver loop, works for millions of features. */
case class Rasterize(source: GeometryBlock, columnName: Option[String] = None,
    dtypeName: String = "int32", proj: String = "EPSG:28992") extends RasterBlock {
  override def dtype: DType =
    if (columnName.isEmpty) DType.Bool else DType.byName(dtypeName)
  override def projection: String = proj
  override def temporal: Boolean = false
  override def timeDeltaMs: Option[Long] = None
  override def period: Option[(Instant, Instant)] = Some((Instant.EPOCH, Instant.EPOCH))
  override def extent: Option[Bbox] = None
  override def allTimes: Seq[Instant] = Seq(Instant.EPOCH)

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val nd = noDataValue
    val tile = TileLayout.TILE
    // feature request scoped to the raster request bbox with min_size = cell
    // (misc.py:626-631: resolution-aware feature pruning)
    val b = req.bbox
    val wkt = s"POLYGON ((${b.x1} ${b.y1}, ${b.x2} ${b.y1}, ${b.x2} ${b.y2}, " +
      s"${b.x1} ${b.y2}, ${b.x1} ${b.y1}))"
    val feats = source.frame(GeometryRequest(geometryWkt = Some(wkt),
      projection = req.projection,
      minSize = if (b.isPoint) None else Some(math.min(req.cellW, req.cellH))))
    val burnCol = columnName.map(c => col(c).cast("double")).getOrElse(lit(1.0))

    // all request cells with centers
    val r = req
    val cells = RasterFrames.generate(req, Seq(Instant.EPOCH), (_, ty, tx) => {
      val tw = TileLayout.tileW(r.width, tx)
      val th = TileLayout.tileH(r.height, ty)
      new Array[Double](tw * th)
    }).select(col("ty"), col("tx"), posexplode(col("values")).as(Seq("pos", "zero")))
      .withColumn("tw", least(lit(tile), lit(r.width) - col("tx") * tile))
      .withColumn("px", col("tx") * tile + col("pos") % col("tw"))
      .withColumn("py", col("ty") * tile + (col("pos") / col("tw")).cast("int"))
      .withColumn("cx", lit(b.x1) + (col("px") + 0.5) * r.cellW)
      .withColumn("cy", lit(b.y2) - (col("py") + 0.5) * r.cellH)
    // grid-key join (cells one key; features replicated over their bbox keys)
    val g = math.max(r.cellW, r.cellH) * 64
    val keyedCells = cells
      .withColumn("gx", floor(col("cx") / g).cast("long"))
      .withColumn("gy", floor(col("cy") / g).cast("long"))
    val fb = feats.select(col("fid"), col("geometry"), burnCol.as("burn"),
      GeomFunctions.stEnvMinX(col("geometry")).as("fx1"),
      GeomFunctions.stEnvMinY(col("geometry")).as("fy1"),
      GeomFunctions.stEnvMaxX(col("geometry")).as("fx2"),
      GeomFunctions.stEnvMaxY(col("geometry")).as("fy2"))
      .withColumn("gx", explode(sequence(floor(col("fx1") / g).cast("long"),
        floor(col("fx2") / g).cast("long"))))
      .withColumn("gy", explode(sequence(floor(col("fy1") / g).cast("long"),
        floor(col("fy2") / g).cast("long"))))
    val burned = keyedCells.join(fb, Seq("gx", "gy"))
      .filter(col("cx") >= col("fx1") && col("cx") <= col("fx2") &&
        col("cy") >= col("fy1") && col("cy") <= col("fy2"))
      .filter(GeomFunctions.stContainsPoint(col("geometry"), col("cx"), col("cy")))
      .groupBy(col("ty"), col("tx"), col("pos"), col("tw"))
      // paint order: last feature (max fid) wins (utils.py:707-715)
      .agg(max_by(col("burn"), col("fid")).as("v"))
    val emptyVal = if (dtype == DType.Bool) 0.0 else nd
    val assemble = udf { (entries: Seq[org.apache.spark.sql.Row], tw: Int, th: Int) =>
      val out = Array.fill(tw * th)(emptyVal)
      entries.foreach(e => out(e.getInt(0)) = e.getDouble(1))
      out
    }
    cells.select(col("ty"), col("tx"), col("tw")).distinct()
      .withColumn("th", least(lit(tile), lit(r.height) - col("ty") * tile))
      .join(burned.groupBy(col("ty"), col("tx"))
        .agg(collect_list(struct(col("pos"), col("v"))).as("entries")),
        Seq("ty", "tx"), "left")
      .select(lit(0L).as("t"), col("ty"), col("tx"),
        assemble(coalesce(col("entries"), array()), col("tw"), col("th")).as("values"))
  }
}
