package graft.raster

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Combine rasters along x, y and time, after the reference `Group`
  * (dask_geomodeling/raster/combine.py:16-464).
  *
  * Metadata is greedy: period/extent are the *union* of sources; timedelta
  * propagates only when all temporal sources share an aligned delta
  * (combine.py:33-64). At equal timesteps the sources are painted
  * left→right with nodata transparent, so the rightmost data value wins
  * (combine.py:152-155). Source pruning by period (get_relevant_sources,
  * combine.py:164-195) keeps irrelevant children out of the plan — the
  * Block-layer analogue of partition pruning.
  */
case class Group(rasters: Seq[RasterBlock]) extends RasterBlock {
  require(rasters.nonEmpty, "Group needs at least one raster")

  override def temporal: Boolean = rasters.exists(_.temporal)
  override def projection: String = rasters.head.projection
  override def dtype: DType = Elemwise.promoteAll(rasters)
  override def cellSize: Option[Double] = rasters.flatMap(_.cellSize).headOption

  override def period: Option[(Instant, Instant)] = {
    val ps = rasters.flatMap(_.period)
    if (ps.isEmpty) None
    else Some((ps.map(_._1).min, ps.map(_._2).max))
  }

  override def extent: Option[Bbox] = {
    val es = rasters.flatMap(_.extent)
    if (es.isEmpty) None else Some(es.reduce(_ union _))
  }

  /** Timedelta only when equal across sources and periods aligned an
    * integer number of deltas apart (combine.py:33-59). */
  override def timeDeltaMs: Option[Long] = {
    val withData = rasters.filter(r => r.period.isDefined && r.timeDeltaMs.isDefined)
    val deltas = withData.flatMap(_.timeDeltaMs)
    if (deltas.isEmpty) None
    else if (deltas.distinct.size > 1) None
    else {
      val d = deltas.head
      val firsts = withData.flatMap(_.period).map(_._1.toEpochMilli)
      if (firsts.forall(f => math.floorMod(firsts.head - f, d) == 0L)) Some(d) else None
    }
  }

  override def allTimes: Seq[Instant] =
    rasters.flatMap(_.allTimes).distinct.sortBy(_.toEpochMilli)

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val wanted = timesIn(req.start, req.stop)
    val nd = noDataValue
    if (wanted.isEmpty) {
      val schema = StructType(Seq(StructField("t", LongType), StructField("ty", IntegerType),
        StructField("tx", IntegerType), StructField("values", ArrayType(DoubleType))))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val wantedMs = wanted.map(_.toEpochMilli)
    val creq = req.copy(start = Some(wanted.head), stop = Some(wanted.last))
    // prune sources whose period misses the wanted interval entirely
    val relevant = rasters.zipWithIndex.filter { case (r, _) =>
      r.period.exists { case (p0, p1) =>
        !p1.isBefore(wanted.head) && !p0.isAfter(wanted.last)
      } && r.timesIn(creq.start, creq.stop).nonEmpty
    }
    val parts = relevant.map { case (r, si) =>
      val rNd = r.noDataValue
      r.frame(creq)
        .filter(col("t").isin(wantedMs: _*))
        .select(col("t"), col("ty"), col("tx"), lit(si).as("si"),
          (if (r.dtype == DType.Bool) col("values")
           else transform(col("values"), x => when(x === rNd, lit(nd)).otherwise(x)))
            .as("values"))
    }
    val unioned = parts.reduce(_ unionByName _)
    // rightmost (highest source index) data value wins per cell
    unioned
      .groupBy(col("t"), col("ty"), col("tx"))
      .agg(sort_array(collect_list(struct(col("si"), col("values")))).as("stack"))
      .select(col("t"), col("ty"), col("tx"),
        aggregate(
          col("stack"),
          transform(col("stack").getItem(0).getField("values"), _ => lit(nd)),
          (acc, s) => zip_with(acc, s.getField("values"),
            (a, x) => when(x === nd, a).otherwise(x))
        ).as("values"))
  }
}
