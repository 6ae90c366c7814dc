package graft.raster

import java.time.{Instant, ZoneId}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal raster blocks, after `dask_geomodeling/raster/temporal.py`.
  *
  * Because frame instants are eager plan metadata in this engine (the
  * reference obtains them via `mode="time"` sub-requests at planning time,
  * SURVEY §3.1), all as-of/nearest/bin-label logic runs driver-side on the
  * metadata; the data path stays a declarative Spark plan — relabeling is a
  * broadcast join against a tiny (srcTime → outTime) mapping, aggregation a
  * `groupBy` over bin labels.
  */
object TemporalFrames {

  def emptyFrame(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(StructField("t", LongType), StructField("ty", IntegerType),
      StructField("tx", IntegerType), StructField("values", ArrayType(DoubleType))))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Relabel/duplicate frames via a (srcMs, outMs) mapping broadcast join. */
  def relabel(frame: DataFrame, mapping: Seq[(Long, Long)])
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val m = broadcast(mapping.toDF("t", "out"))
    frame.join(m, Seq("t"))
      .select(col("out").as("t"), col("ty"), col("tx"), col("values"))
  }

  /** `find_neigbours` (reference utils.py:929-958) for one value. */
  def neighbourIndex(times: IndexedSeq[Long], value: Long, direction: String): Int = {
    if (times.length == 1) return 0
    val idx = direction match {
      case "nearest" =>
        // searchsorted(side='left') over midpoints; an exact midpoint snaps
        // to the earlier frame
        val mids = times.sliding(2).map(p => p(0) + (p(1) - p(0)) / 2.0).toIndexedSeq
        mids.indexWhere(_ >= value) match {
          case -1 => times.length - 1
          case i  => i
        }
      case "forward"  => times.indexWhere(_ >= value) match {
        case -1 => times.length - 1; case i => i
      }
      case "backward" => times.lastIndexWhere(_ <= value) match {
        case -1 => 0; case i => i
      }
    }
    math.max(0, math.min(idx, times.length - 1))
  }
}

/** As-of alignment: cell values of `store` at the timestamps of `index`
  * (nearest store frame); a non-temporal store broadcasts over the index
  * time axis (temporal.py:42-182). */
case class Snap(store: RasterBlock, index: RasterBlock) extends RasterBlock {
  override def dtype: DType = store.dtype
  override def period: Option[(Instant, Instant)] =
    if (store.period.isEmpty) None else index.period
  override def timeDeltaMs: Option[Long] = index.timeDeltaMs
  override def temporal: Boolean = index.temporal
  override def extent: Option[Bbox] = store.extent
  override def projection: String = store.projection
  override def cellSize: Option[Double] = store.cellSize
  override def allTimes: Seq[Instant] =
    if (store.period.isEmpty) Seq.empty else index.allTimes

  /** Meta strings follow the nearest-frame mapping (temporal.py:169-181). */
  override def metaFor(times: Seq[Instant]): Option[Seq[String]] = {
    val storeTimes = store.allTimes
    if (storeTimes.isEmpty) return None
    val ms = storeTimes.map(_.toEpochMilli).toIndexedSeq
    val mapped = times.map(t =>
      storeTimes(TemporalFrames.neighbourIndex(ms, t.toEpochMilli, "nearest")))
    store.metaFor(mapped)
  }

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val outTimes = timesIn(req.start, req.stop)
    if (outTimes.isEmpty) return TemporalFrames.emptyFrame
    val storeTimes = store.allTimes.map(_.toEpochMilli).toIndexedSeq
    val mapping = outTimes.map { t =>
      val i = TemporalFrames.neighbourIndex(storeTimes, t.toEpochMilli, "nearest")
      (storeTimes(i), t.toEpochMilli)
    }
    val needed = mapping.map(_._1).distinct.sorted
    val sreq = req.copy(start = Some(Instant.ofEpochMilli(needed.head)),
      stop = Some(Instant.ofEpochMilli(needed.last)))
    val f = store.frame(sreq).filter(col("t").isin(needed: _*))
    TemporalFrames.relabel(f, mapping)
  }
}

/** Shift the time axis by `timeMs` (positive = into the future); the child
  * request is shifted backwards, labels forwards (temporal.py:185-236). */
case class Shift(store: RasterBlock, timeMs: Long) extends BaseSingleRaster {
  override def period: Option[(Instant, Instant)] =
    store.period.map { case (a, b) => (a.plusMillis(timeMs), b.plusMillis(timeMs)) }
  override def allTimes: Seq[Instant] = store.allTimes.map(_.plusMillis(timeMs))
  override def metaFor(times: Seq[Instant]): Option[Seq[String]] =
    store.metaFor(times.map(_.minusMillis(timeMs)))
  override protected def kernel(v: Column): Column = v
  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val sreq = req.copy(start = req.start.map(_.minusMillis(timeMs)),
      stop = req.stop.map(_.minusMillis(timeMs)))
    store.frame(sreq).withColumn("t", col("t") + timeMs)
  }
}

/** Plain (nodata-oblivious) sum over the whole requested time axis; single
  * output frame labeled at the last timestamp (temporal.py:239-255). */
case class TemporalSum(store: RasterBlock) extends BaseSingleRaster {
  override protected def kernel(v: Column): Column = v
  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val times = store.timesIn(req.start, req.stop)
    if (times.isEmpty) return TemporalFrames.emptyFrame
    val lastMs = times.last.toEpochMilli
    store.frame(req)
      .groupBy(col("ty"), col("tx"))
      .agg(sort_array(collect_list(struct(col("t"), col("values")))).as("stack"))
      .select(lit(lastMs).as("t"), col("ty"), col("tx"),
        Statistics.stackKernel("rawsum", noDataValue)(
          transform(col("stack"), s => s.getField("values"))).as("values"))
  }
}

/** Resample to a pandas offset frequency with a statistic
  * (temporal.py:480-768). `frequency=None` → one statistic over the full
  * period, labeled at the period end. Empty bins give 0 for extensive
  * statistics (sum/count) and nodata for intensive ones. */
case class TemporalAggregate(
    source: RasterBlock,
    frequency: Option[String],
    statistic: String = "sum",
    closedOpt: Option[String] = None,
    labelOpt: Option[String] = None,
    timezone: String = "UTC"
) extends RasterBlock {
  Statistics.validate(statistic)
  private val freq: Option[Freq] = frequency.map(Freq.parse)
  private val zone: ZoneId = ZoneId.of(timezone)
  private def sides: (String, String) =
    freq.map(_.defaults(closedOpt, labelOpt)).getOrElse(("right", "right"))

  override def dtype: DType = DType.statResult(source.dtype, statistic)
  override def temporal: Boolean = frequency.isDefined
  override def timeDeltaMs: Option[Long] = freq.flatMap(_.timeDeltaMs)
  override def extent: Option[Bbox] = source.extent
  override def projection: String = source.projection

  override def period: Option[(Instant, Instant)] = source.period.map { case (a, b) =>
    freq match {
      case None => (b, b)
      case Some(f) =>
        val (c, l) = sides
        (f.binLabel(a, c, l, zone), f.binLabel(b, c, l, zone))
    }
  }

  override def allTimes: Seq[Instant] = period match {
    case None => Seq.empty
    case Some((a, b)) => freq match {
      case None    => Seq(a)
      case Some(f) => f.range(a, b, zone)
    }
  }

  /** Meta regrouped per bin: each output label carries the meta strings of
    * its contributing source frames (temporal.py:716-720). */
  override def metaGroupsFor(times: Seq[Instant]): Option[Seq[Seq[String]]] = {
    val srcTimes = source.allTimes
    if (srcTimes.isEmpty) return Some(times.map(_ => Seq.empty))
    val srcMeta = source.metaFor(srcTimes) match {
      case None    => return None
      case Some(m) => m
    }
    val (c, l) = sides
    val labelOf: Instant => Long = freq match {
      case None    => _ => allTimes.head.toEpochMilli
      case Some(f) => t => f.binLabel(t, c, l, zone).toEpochMilli
    }
    // label each source frame once, then group — O(|src| + |times|), not
    // the quadratic per-(label, frame) recomputation
    val byLabel = srcTimes.lazyZip(srcMeta)
      .map { case (t, m) => (labelOf(t), m) }
      .groupBy(_._1)
    Some(times.map(lab =>
      byLabel.getOrElse(lab.toEpochMilli, Seq.empty).map(_._2)))
  }

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val wanted = timesIn(req.start, req.stop)
    if (wanted.isEmpty) return TemporalFrames.emptyFrame
    val (c, l) = sides
    val srcTimes = source.allTimes
    val wantedSet = wanted.map(_.toEpochMilli).toSet
    // map each source frame to its bin label
    val mapping: Seq[(Long, Long)] = freq match {
      case None    => srcTimes.map(t => t.toEpochMilli -> wanted.head.toEpochMilli)
      case Some(f) => srcTimes.map(t =>
        t.toEpochMilli -> f.binLabel(t, c, l, zone).toEpochMilli)
    }
    val used = mapping.filter { case (_, lab) => wantedSet.contains(lab) }
    val nd = noDataValue
    val srcNd = source.noDataValue
    val stat = statistic
    val aggregated: Option[DataFrame] = if (used.isEmpty) None else {
      val needed = used.map(_._1).sorted
      val sreq = req.copy(start = Some(Instant.ofEpochMilli(needed.head)),
        stop = Some(Instant.ofEpochMilli(needed.last)))
      val f = source.frame(sreq).filter(col("t").isin(needed: _*))
      // relabel inline (not via TemporalFrames.relabel) keeping the source
      // time: 'first'/'last'/argmin-argmax statistics depend on stack order,
      // so the collected stack must be sorted by source time — a bare
      // collect_list is shuffle-order-nondeterministic.
      import spark.implicits._
      val mappingDf = broadcast(used.toDF("src_t", "t"))
      val relabeled = f
        .select(col("t").as("src_t"), col("ty"), col("tx"), col("values"))
        .join(mappingDf, Seq("src_t"))
      val valExpr =
        if (source.dtype == DType.Bool) col("values")
        else transform(col("values"), x => when(x === srcNd, lit(nd)).otherwise(x))
      val grouped = relabeled
        .groupBy(col("t"), col("ty"), col("tx"))
        .agg(transform(
          sort_array(collect_list(struct(col("src_t").as("k"), valExpr.as("v")))),
          s => s.getField("v")).as("stack"))
      // primitive per-tile fold over the time-sorted stack (every statistic)
      val reduced = Statistics.stackKernel(stat, nd)(col("stack"))
      Some(grouped.select(col("t"), col("ty"), col("tx"), reduced.as("values")))
    }
    // labels with no contributing frames: constant fill tiles
    val emptyLabels = wanted.filterNot(t => used.exists(_._2 == t.toEpochMilli))
    val emptyPart: Option[DataFrame] = if (emptyLabels.isEmpty) None else {
      val fill = Statistics.emptyValue(stat, nd)
      Some(RasterFrames.generate(req, emptyLabels, (_, ty, tx) => {
        val tw = TileLayout.tileW(req.width, tx)
        val th = TileLayout.tileH(req.height, ty)
        Array.fill(tw * th)(fill)
      }))
    }
    (aggregated, emptyPart) match {
      case (Some(a), Some(e)) => a.unionByName(e)
      case (Some(a), None)    => a
      case (None, Some(e))    => e
      case (None, None)       => TemporalFrames.emptyFrame
    }
  }
}

/** Running sum/count along time, reset at each `frequency` bin boundary;
  * output timedelta equals the input's (temporal.py:775-1005). Uses a Spark
  * window over exploded cells — the idiomatic distributed cumulative. */
case class Cumulative(
    source: RasterBlock,
    statistic: String = "sum",
    frequency: Option[String] = None,
    timezone: String = "UTC"
) extends BaseSingleRaster {
  require(statistic == "sum" || statistic == "count", "statistic must be sum or count")
  private val freq: Option[Freq] = frequency.map(Freq.parse)
  private val zone: ZoneId = ZoneId.of(timezone)
  override def store: RasterBlock = source
  override def dtype: DType = DType.statResult(source.dtype, statistic)
  override protected def kernel(v: Column): Column = v

  /** Meta accumulated within the bin: each output frame carries the meta
    * strings of all source frames of its bin up to and including itself
    * (temporal.py:945-957). */
  override def metaGroupsFor(times: Seq[Instant]): Option[Seq[Seq[String]]] = {
    val srcTimes = source.allTimes
    if (srcTimes.isEmpty) return None
    val srcMeta = source.metaFor(srcTimes) match {
      case None    => return None
      case Some(m) => m
    }
    def binKey(t: Instant): Long = freq match {
      case None    => 0L
      case Some(f) => f.binLabel(t, "right", "right", zone).toEpochMilli
    }
    // bin each source frame once (O(|src| log + |times| log), not
    // quadratic): within a bin, the prefix up to and including t
    val keyed = srcTimes.lazyZip(srcMeta)
      .map { case (st, m) => (binKey(st), st, m) }
      .groupBy(_._1)
      .map { case (b, xs) => b -> xs.sortBy(_._2) }
    Some(times.map { t =>
      val b = binKey(t)
      keyed.getOrElse(b, Seq.empty).takeWhile(!_._2.isAfter(t)).map(_._3)
    })
  }

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val outTimes = source.timesIn(req.start, req.stop)
    if (outTimes.isEmpty) return TemporalFrames.emptyFrame
    val outSet = outTimes.map(_.toEpochMilli).toSet
    // bin key per source frame; accumulation covers all frames of the bins
    // that contain requested output frames, from bin start onwards
    def binKey(t: Instant): Long = freq match {
      case None    => 0L
      case Some(f) => f.binLabel(t, "right", "right", zone).toEpochMilli
    }
    val bins = outTimes.map(binKey).toSet
    val needed = source.allTimes
      .filter(t => bins.contains(binKey(t)) && !t.isAfter(outTimes.last))
      .map(_.toEpochMilli)
    val binOf = needed.map(ms => ms -> binKey(Instant.ofEpochMilli(ms))).toMap
    val sreq = req.copy(start = Some(Instant.ofEpochMilli(needed.min)),
      stop = Some(Instant.ofEpochMilli(needed.max)))
    val nd = noDataValue
    val srcNd = source.noDataValue
    import spark.implicits._
    val binDf = broadcast(binOf.toSeq.toDF("t", "bin"))
    val exploded = source.frame(sreq)
      .filter(col("t").isin(needed: _*))
      .join(binDf, Seq("t"))
      .select(col("t"), col("bin"), col("ty"), col("tx"),
        posexplode(col("values")).as(Seq("pos", "v")))
    val w = Window.partitionBy(col("bin"), col("ty"), col("tx"), col("pos"))
      .orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum =
      if (statistic == "sum")
        sum(when(col("v") =!= srcNd, col("v")).otherwise(0.0)).over(w)
      else
        sum(when(col("v") =!= srcNd, 1.0).otherwise(0.0)).over(w)
    val assemble = udf { (entries: Seq[Row]) =>
      val out = new Array[Double](entries.size)
      entries.foreach(e => out(e.getInt(0)) = e.getDouble(1))
      out
    }
    exploded
      .withColumn("cum", cum)
      .filter(col("t").isin(outSet.toSeq: _*))
      .groupBy(col("t"), col("ty"), col("tx"))
      .agg(assemble(sort_array(collect_list(struct(col("pos"), col("cum"))))).as("values"))
  }
}

/** Re-label frames onto a regular frequency grid, snapping each label to the
  * nearest/forward/backward source frame (temporal.py:1008-1215). */
case class Resample(
    source: RasterBlock,
    frequency: String,
    direction: String = "nearest",
    timezone: String = "UTC"
) extends BaseSingleRaster {
  require(Set("nearest", "forward", "backward").contains(direction),
    "direction must be one of 'nearest', 'backward', or 'forward'.")
  private val freq: Freq = Freq.parse(frequency)
  private val zone: ZoneId = ZoneId.of(timezone)
  override def store: RasterBlock = source
  override def timeDeltaMs: Option[Long] = freq.timeDeltaMs
  override def metaFor(times: Seq[Instant]): Option[Seq[String]] = {
    val srcTimes = source.allTimes
    if (srcTimes.isEmpty) return None
    val ms = srcTimes.map(_.toEpochMilli).toIndexedSeq
    source.metaFor(times.map(t =>
      srcTimes(TemporalFrames.neighbourIndex(ms, t.toEpochMilli, direction))))
  }
  override protected def kernel(v: Column): Column = v

  /** Label range containing data, per direction (temporal.py:1080-1125). */
  override def period: Option[(Instant, Instant)] = source.period.map { case (p0, p1) =>
    direction match {
      case "forward"  => (freq.closestLabel(p0, zone, "left"), freq.closestLabel(p1, zone, "left"))
      case "backward" => (freq.closestLabel(p0, zone, "right"), freq.closestLabel(p1, zone, "right"))
      case _ =>
        var start = freq.closestLabel(p0, zone, "left")
        if (!p0.isBefore(freq.shiftFrac(start, 0.5, zone)))
          start = freq.closestLabel(p0, zone, "right")
        var end = freq.closestLabel(p1, zone, "right")
        if (p1.isBefore(freq.shiftFrac(end, -0.5, zone)))
          end = freq.closestLabel(p1, zone, "left")
        (start, end)
    }
  }

  override def allTimes: Seq[Instant] = period match {
    case None => Seq.empty
    case Some((a, b)) => freq.range(a, b, zone)
  }

  override def frame(req: RasterRequest)(implicit spark: SparkSession): DataFrame = {
    val wanted = timesIn(req.start, req.stop)
    if (wanted.isEmpty) return TemporalFrames.emptyFrame
    val srcTimes = source.allTimes.map(_.toEpochMilli).toIndexedSeq
    val mapping = wanted.map { t =>
      val i = TemporalFrames.neighbourIndex(srcTimes, t.toEpochMilli, direction)
      (srcTimes(i), t.toEpochMilli)
    }
    val needed = mapping.map(_._1).distinct.sorted
    val sreq = req.copy(start = Some(Instant.ofEpochMilli(needed.head)),
      stop = Some(Instant.ofEpochMilli(needed.last)))
    val f = source.frame(sreq).filter(col("t").isin(needed: _*))
    TemporalFrames.relabel(f, mapping)
  }
}
