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

/** Shared feature-envelope → grid-cell explode for the geometry⨝raster
  * joins (Rasterize and ZonalStats). Input rows must carry `fx1`/`fy1`/
  * `fx2`/`fy2` envelope columns; output adds `py`/`cy` and `px`/`cx` for
  * every cell whose CENTER the envelope covers (exact comparisons; the
  * sequence bounds carry ±1 cell slack). Two-stage explode with the row
  * filter in between, so a full-extent feature materializes sequences of
  * at most max(w, h) elements — never w × h — and off-row slack never
  * multiplies into the px explode. */
private[graft] object EnvelopeCells {
  def explode(df: DataFrame, bx1: Double, by2: Double, cw: Double, ch: Double,
      w: Int, h: Int): DataFrame =
    df
      // envelope must intersect the grid window (also keeps the sequence
      // bounds well-ordered); exact cell membership is decided below
      .filter(col("fx2") >= bx1 && col("fx1") <= bx1 + w * cw &&
        col("fy2") >= by2 - h * ch && col("fy1") <= by2)
      .withColumn("py", org.apache.spark.sql.functions.explode(sequence(
        greatest(floor((lit(by2) - col("fy2")) / ch - 0.5).cast("long") - 1, lit(0L)),
        least(floor((lit(by2) - col("fy1")) / ch - 0.5).cast("long") + 1,
          lit((h - 1).toLong)))))
      .withColumn("cy", lit(by2) - (col("py") + 0.5) * ch)
      .filter(col("cy") >= col("fy1") && col("cy") <= col("fy2"))
      .withColumn("px", org.apache.spark.sql.functions.explode(sequence(
        greatest(floor((col("fx1") - bx1) / cw - 0.5).cast("long") - 1, lit(0L)),
        least(floor((col("fx2") - bx1) / cw - 0.5).cast("long") + 1,
          lit((w - 1).toLong)))))
      .withColumn("cx", lit(bx1) + (col("px") + 0.5) * cw)
      .filter(col("cx") >= col("fx1") && col("cx") <= col("fx2"))
}

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
  * presence mask when None (misc.py:518-709). Each feature explodes
  * directly to the cell indices its envelope covers (bounded arithmetic
  * sequences — candidate rows are O(Σ per-feature envelope cells), with no
  * dense cell table and no block join that would pay a full 64²-cell block
  * per tiny feature) — no per-feature driver loop, works for millions of
  * features. */
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

    val r = req
    // each feature explodes to the cells whose centers its envelope
    // covers (see EnvelopeCells — candidate rows are O(Σ envelope cells))
    val fb = EnvelopeCells.explode(
      feats.select(col("fid"), col("geometry"), burnCol.as("burn"),
        GeomFunctions.stEnvMinX(col("geometry")).as("fx1"),
        GeomFunctions.stEnvMinY(col("geometry")).as("fy1"),
        GeomFunctions.stEnvMaxX(col("geometry")).as("fx2"),
        GeomFunctions.stEnvMaxY(col("geometry")).as("fy2")),
      b.x1, b.y2, r.cellW, r.cellH, r.width, r.height)
    val burned = fb
      .filter(GeomFunctions.stContainsPoint(col("geometry"), col("cx"), col("cy")))
      .withColumn("ty", (col("py") / tile).cast("int"))
      .withColumn("tx", (col("px") / tile).cast("int"))
      .withColumn("tw", least(lit(tile), lit(r.width) - col("tx") * tile))
      .withColumn("pos",
        ((col("py") % tile) * col("tw") + (col("px") % tile)).cast("int"))
      .groupBy(col("ty"), col("tx"), col("pos"), col("tw"))
      // paint order: last feature (max fid) wins (utils.py:707-715)
      .agg(max_by(col("burn"), col("fid")).as("v"))
    val emptyVal = if (dtype == DType.Bool) 0.0 else nd
    val assemble = udf { (entries: Seq[org.apache.spark.sql.Row], tw: Int, th: Int) =>
      val out = Array.fill(tw * th)(emptyVal)
      entries.foreach(e => out(e.getInt(0)) = e.getDouble(1))
      out
    }
    // tile shell for densification (every tile appears, burned or not)
    import spark.implicits._
    val nTx = TileLayout.tilesX(r.width)
    val nTiles = TileLayout.numTiles(r.width, r.height)
    spark.range(nTiles).mapPartitions { it =>
      it.map { i => ((i / nTx).toInt, (i % nTx).toInt) }
    }.toDF("ty", "tx")
      .withColumn("tw", least(lit(tile), lit(r.width) - col("tx") * tile))
      .withColumn("th", least(lit(tile), lit(r.height) - col("ty") * tile))
      .join(burned.groupBy(col("ty"), col("tx"))
        .agg(collect_list(struct(col("pos"), col("v"))).as("entries")),
        Seq("ty", "tx"), "left")
      .select(lit(0L).as("t"), col("ty"), col("tx"),
        assemble(coalesce(col("entries"), array()), col("tw"), col("th")).as("values"))
  }
}
