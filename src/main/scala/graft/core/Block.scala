package graft.core

/** The fundamental lazy operator-DAG node, after the reference's `Block`
  * (dask_geomodeling/core/graphs.py:85-291).
  *
  * Differences from the reference are architectural, not semantic:
  *  - the reference's two-phase `get_sources_and_requests` / `process`
  *    evaluation becomes *lowering to a Spark DataFrame plan* — each concrete
  *    Block family (raster / feature / series) exposes a `frame(request)`
  *    that declares the Spark logical plan; Catalyst + Tungsten own physical
  *    execution (replacing the dask scheduler, SURVEY §3.1);
  *  - plan metadata (period / extent / dtype / schema) stays eager, computed
  *    as pure functions of children exactly like the reference's properties.
  *
  * Blocks are immutable case classes; `args` defaults to the case-class
  * fields in declaration order, which keeps the JSON v2 view serde
  * (core/graphs.py:265-286) and the deterministic token in sync with the
  * constructor signature for free.
  */
trait Block extends Product with Serializable {

  /** Constructor args in order: child Blocks and/or plain literals. */
  def args: Seq[Any] = productIterator.toSeq

  /** A DummyBlock masquerades as the node it replaces: its token is the
    * one embedded in its name and its graph key IS that name
    * (core/graphs.py:293-308) — so a partial graph with dummy endpoints
    * tokenizes identically to the full graph. */
  final lazy val token: String = this match {
    case DummyBlock(n) => n.split("_").lift(1).getOrElse(n)
    case _ => Token.of(getClass.getName, args)
  }

  /** Graph key, mirroring the reference's `name = "{Class}_{token}"`
    * (core/graphs.py:220-222). */
  final def graphName: String = this match {
    case DummyBlock(n) => n
    case _ => s"${getClass.getSimpleName}_$token"
  }

  def children: Seq[Block] = args.flatMap {
    case b: Block  => Seq(b)
    case s: Seq[_] => s.collect { case b: Block => b }
    case _         => Seq.empty
  }

  // ---- JSON v2 view serde (core/graphs.py:265-286) -------------------------

  /** Flat graph: {graphName: [importPath, arg...]}, block args replaced by
    * their graph keys — identical shared subgraphs collapse onto one key
    * (the reference's CSE, core/graphs.py:176-177). */
  final def graph: Map[String, List[Any]] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, List[Any]]
    def visit(b: Block): Unit = {
      if (!out.contains(b.graphName)) {
        b.children.foreach(visit)
        val serArgs = b.args.map {
          case c: Block => c.graphName
          case s: Seq[_] => s.map {
            case c: Block => c.graphName
            case v        => v
          }
          case i: java.time.Instant => i.toString
          case v        => v
        }
        out(b.graphName) = b.getClass.getName :: serArgs.toList
      }
    }
    visit(this)
    out.toMap
  }

  final def serialize: Map[String, Any] =
    Map("version" -> 2, "graph" -> graph, "name" -> graphName)

  final def toJson: String = Json.render(serialize)
}

/** Placeholder node with a user-supplied name for partial evaluation,
  * after `DummyBlock` (core/graphs.py:293-308). It stands in for a node of
  * ANY kind — raster, geometry, or series — so reference-emitted partial
  * graphs construct whatever the surrounding operators expect; computing
  * through it fails loudly, same as the reference (a dummy has no data). */
case class DummyBlock(dummyName: String) extends graft.raster.RasterBlock
    with graft.geometry.GeometryBlock with graft.geometry.SeriesBlock {
  private def unsupported: Nothing = throw new UnsupportedOperationException(
    s"DummyBlock '$dummyName' is a token-computation placeholder and cannot compute")
  override def args: Seq[Any] = Seq(dummyName)
  // RasterBlock surface
  override def period: Option[(java.time.Instant, java.time.Instant)] = unsupported
  override def timeDeltaMs: Option[Long] = unsupported
  override def extent: Option[graft.raster.Bbox] = unsupported
  override def projection: String = unsupported
  override def dtype: graft.raster.DType = unsupported
  override def temporal: Boolean = unsupported
  override def allTimes: Seq[java.time.Instant] = unsupported
  override def frame(req: graft.raster.RasterRequest)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    unsupported
  // GeometryBlock surface
  override def columns: Set[String] = unsupported
  override def frame(req: graft.geometry.GeometryRequest)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    unsupported
  // SeriesBlock surface
  override def root: graft.geometry.GeometryBlock = unsupported
  override def column(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Column =
    unsupported
}

/** Registry of Block constructors for deserializing JSON v2 views
  * (the role of `construct` / `construct_multiple`, core/graphs.py:52-82).
  * Operators self-register a `Seq[Any] => Block` factory keyed by class name.
  */
object BlockRegistry {
  private val factories =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Any] => Block]

  def register(className: String)(f: Seq[Any] => Block): Unit =
    factories(className) = f

  /** Generic factory via the primary constructor, coercing JSON literals
    * (Long/Double/String/Boolean/List/null) to the declared parameter
    * classes. Covers the common shapes: numbers, strings, options, blocks,
    * Seq[Double], Seq[(Double, Double)] (2-lists), Seq[String], tuples of
    * numbers. Blocks with exotic arg shapes register a custom factory. */
  def registerAuto(cls: Class[_ <: Block]): Unit = register(cls.getName) { args =>
    val ctor = cls.getConstructors.maxBy(_.getParameterCount)
    val types = ctor.getParameterTypes
    require(types.length == args.length,
      s"${cls.getName}: expected ${types.length} args, got ${args.length}")
    val coerced = args.zip(types).map { case (a, t) => coerce(a, t) }
    try ctor.newInstance(coerced.map(_.asInstanceOf[AnyRef]): _*)
      .asInstanceOf[Block]
    catch { // surface the constructor's own error, not the reflect wrapper
      case e: java.lang.reflect.InvocationTargetException =>
        throw new IllegalArgumentException(
          s"${cls.getName}(${coerced.mkString(", ")}): ${e.getCause}",
          e.getCause)
    }
  }

  private def coerce(a: Any, t: Class[_]): Any = {
    def num(v: Any): Double = v match {
      case d: Double => d; case l: Long => l.toDouble; case i: Int => i.toDouble
      case other => other.toString.toDouble
    }
    if (t == classOf[Int] || t == java.lang.Integer.TYPE) num(a).toInt
    else if (t == classOf[Long] || t == java.lang.Long.TYPE) num(a).toLong
    else if (t == classOf[Double] || t == java.lang.Double.TYPE) num(a)
    else if (t == classOf[Boolean] || t == java.lang.Boolean.TYPE)
      a.toString.toBoolean
    else if (t == classOf[String]) a.toString
    else if (t == classOf[Option[_]]) {
      def wrap(v: Any): Option[Any] = Some(v match {
        case l: Long => l.toDouble; case i: Int => i.toDouble; case x => x
      })
      a match {
        case null | None => None
        case Some(v)     => wrap(v)
        case v           => wrap(v)
      }
    }
    else if (classOf[Block].isAssignableFrom(t)) a.asInstanceOf[Block]
    else if (classOf[Seq[_]].isAssignableFrom(t)) a match {
      case s: Seq[_] => s.map {
        case b: Block => b
        case l: Seq[_] if l.size == 2 && l.forall(x => x.isInstanceOf[Long]
          || x.isInstanceOf[Double] || x.isInstanceOf[Int]) =>
          (num(l.head), num(l(1))) // 2-number lists → (Double, Double)
        case l: Long => l.toDouble
        case i: Int  => i.toDouble
        case v       => v
      }
      case null => Nil
      case v    => Seq(v)
    }
    else if (classOf[Product].isAssignableFrom(t)) a match {
      case s: Seq[_] if s.size == 2 =>
        if (s.forall(x => x.isInstanceOf[Long] || x.isInstanceOf[Int] || x.isInstanceOf[Double]))
          (num(s.head), num(s(1)))
        else (s.head, s(1))
      case p: Product => p
      case v          => v
    }
    else a
  }

  /** Register the standard operator inventory. Idempotent. */
  lazy val registerBuiltins: Unit = {
    import graft.raster._
    Seq[Class[_ <: Block]](
      classOf[Add], classOf[Subtract], classOf[Multiply], classOf[Divide],
      classOf[Power], classOf[Equal], classOf[NotEqual], classOf[Greater],
      classOf[GreaterEqual], classOf[Less], classOf[LessEqual], classOf[Invert],
      classOf[And], classOf[Or], classOf[Xor], classOf[IsData], classOf[IsNoData],
      classOf[Exp], classOf[Log], classOf[Log10], classOf[FillNoData],
      classOf[Clip], classOf[Mask], classOf[MaskBelow], classOf[Step],
      classOf[Classify], classOf[Reclassify], classOf[Group], classOf[Max],
      classOf[Reduce], classOf[Snap], classOf[Shift], classOf[TemporalSum],
      classOf[TemporalAggregate], classOf[Cumulative], classOf[Resample],
      classOf[Dilate], classOf[MovingMax], classOf[Smooth], classOf[HillShade],
      classOf[Place], classOf[RasterizeWKT], classOf[Rasterize],
      classOf[TableRasterSource], classOf[RasterParquetSource], classOf[RasterTiler],
      classOf[GeoTiffSource], classOf[AsciiGridSource], classOf[XyzSource],
      classOf[PngSource], classOf[EnviSource], classOf[NetCdfSource]
    ).foreach(registerAuto)
    Seq[Class[_ <: Block]](
      classOf[graft.geometry.GetSeriesBlock], classOf[graft.geometry.SetSeriesBlock],
      classOf[graft.geometry.TableGeometrySource], classOf[graft.geometry.GeometryWKTSource],
      classOf[graft.geometry.MergeGeometryBlocks], classOf[graft.geometry.ParseTextColumn],
      classOf[graft.geometry.Buffer], classOf[graft.geometry.Simplify],
      classOf[graft.geometry.Difference], classOf[graft.geometry.Intersection],
      classOf[graft.geometry.Area], classOf[graft.geometry.AggregateRaster],
      classOf[graft.geometry.AggregateRasterAboveThreshold],
      classOf[graft.geometry.GeoParquetSource], classOf[graft.geometry.GeometryTiler],
      classOf[graft.geometry.GeoJsonSource], classOf[graft.geometry.ShapefileSource],
      classOf[graft.geometry.GeoPackageSource], classOf[graft.geometry.GeometryFileSource],
      classOf[graft.geometry.GmlSource], classOf[graft.geometry.FlatGeobufSource],
      classOf[graft.geometry.CsvWktSource], classOf[graft.geometry.KmlSource],
      classOf[graft.geometry.GpxSource], classOf[graft.geometry.MifSource],
      classOf[graft.geometry.DxfSource]
    ).foreach(registerAuto)
    Seq[Class[_ <: Block]](
      classOf[graft.geometry.FieldOps.Add], classOf[graft.geometry.FieldOps.Subtract],
      classOf[graft.geometry.FieldOps.Multiply], classOf[graft.geometry.FieldOps.Divide],
      classOf[graft.geometry.FieldOps.FloorDivide], classOf[graft.geometry.FieldOps.Power],
      classOf[graft.geometry.FieldOps.Modulo], classOf[graft.geometry.FieldOps.Equal],
      classOf[graft.geometry.FieldOps.NotEqual], classOf[graft.geometry.FieldOps.Greater],
      classOf[graft.geometry.FieldOps.GreaterEqual], classOf[graft.geometry.FieldOps.Less],
      classOf[graft.geometry.FieldOps.LessEqual], classOf[graft.geometry.FieldOps.And],
      classOf[graft.geometry.FieldOps.Or], classOf[graft.geometry.FieldOps.Xor],
      classOf[graft.geometry.FieldOps.Invert], classOf[graft.geometry.FieldOps.Where],
      classOf[graft.geometry.FieldOps.Mask], classOf[graft.geometry.FieldOps.Round],
      classOf[graft.geometry.FieldOps.Classify],
      classOf[graft.geometry.FieldOps.ClassifyFromColumns],
      classOf[graft.geometry.FieldOps.Interp], classOf[graft.geometry.FieldOps.Choose]
    ).foreach(registerAuto)
    // custom factories where erasure defeats the generic coercion
    // (Option[Long] maxPixels, Option[Double] pixelSize side by side)
    register(classOf[graft.geometry.AggregateRaster].getName) { args =>
      def optD(a: Any): Option[Double] = a match {
        case null | None => None
        case Some(v) => Some(v.toString.toDouble)
        case v => Some(v.toString.toDouble)
      }
      graft.geometry.AggregateRaster(
        args(0).asInstanceOf[graft.geometry.GeometryBlock],
        args(1).asInstanceOf[graft.raster.RasterBlock],
        args(2).toString,
        args(3) match { case null | None => None; case Some(v) => Some(v.toString); case v => Some(v.toString) },
        optD(args(4)), optD(args(5)).map(_.toLong), args(6).toString,
        args(7).toString.toBoolean)
    }
    register(classOf[graft.geometry.AggregateRasterAboveThreshold].getName) { args =>
      def optD(a: Any): Option[Double] = a match {
        case null | None => None
        case Some(v) => Some(v.toString.toDouble)
        case v => Some(v.toString.toDouble)
      }
      graft.geometry.AggregateRasterAboveThreshold(
        args(0).asInstanceOf[graft.geometry.GeometryBlock],
        args(1).asInstanceOf[graft.raster.RasterBlock],
        args(2).toString,
        args(3) match { case null | None => None; case Some(v) => Some(v.toString); case v => Some(v.toString) },
        optD(args(4)), optD(args(5)).map(_.toLong), args(6).toString,
        args(7).toString)
    }
    graft.raster.MemorySource.ensureRegistered()

    // --- reference-dialect aliases -------------------------------------
    // A view serialized by the Python reference names every block by its
    // import path (core/graphs.py:229-249 get_import_path), e.g.
    // "dask_geomodeling.raster.elemwise.Add". Alias those spellings onto
    // the engine factories so reference-emitted JSON constructs unchanged.
    // Forwarding through construct() keeps late binding with the custom
    // factories registered above.
    def alias(refPath: String, cls: Class[_ <: Block]): Unit =
      register(refPath)(args => construct(cls.getName, args))
    def aliasAll(module: String, classes: Seq[Class[_ <: Block]]): Unit =
      classes.foreach(c => alias(s"$module.${c.getSimpleName}", c))

    aliasAll("dask_geomodeling.raster.elemwise", Seq(
      classOf[Add], classOf[Subtract], classOf[Multiply], classOf[Divide],
      classOf[Power], classOf[Equal], classOf[NotEqual], classOf[Greater],
      classOf[GreaterEqual], classOf[Less], classOf[LessEqual], classOf[Invert],
      classOf[And], classOf[Or], classOf[Xor], classOf[IsData],
      classOf[IsNoData], classOf[Exp], classOf[Log], classOf[Log10],
      classOf[FillNoData]))
    aliasAll("dask_geomodeling.raster.misc", Seq(
      classOf[Clip], classOf[Mask], classOf[MaskBelow], classOf[Step],
      classOf[Classify], classOf[Reclassify], classOf[RasterizeWKT]))
    // Rasterize serializes (source, column_name, dtype, limit)
    // (raster/misc.py:548-560): dtype defaults by column presence, and
    // `limit` is the reference's feature-count guard — the engine guards
    // through RequestGuards instead, so the value is accepted and dropped
    register("dask_geomodeling.raster.misc.Rasterize") { args =>
      def opt(v: Any): Option[String] = v match {
        case null | None => None
        case Some(x) => Some(x.toString)
        case x => Some(x.toString)
      }
      val colName = opt(args.lift(1).orNull)
      val dtype = opt(args.lift(2).orNull)
        .getOrElse(if (colName.isEmpty) "bool" else "int32")
      Rasterize(args.head.asInstanceOf[graft.geometry.GeometryBlock],
        colName, dtype)
    }
    aliasAll("dask_geomodeling.raster.temporal", Seq(
      classOf[Snap], classOf[Shift], classOf[TemporalSum],
      classOf[TemporalAggregate], classOf[Cumulative], classOf[Resample]))
    aliasAll("dask_geomodeling.raster.spatial", Seq(
      classOf[Dilate], classOf[MovingMax], classOf[Smooth],
      classOf[HillShade]))
    // the reference's Place serializes FIVE args — (store, projection,
    // anchor tuple, coordinate tuples, statistic) — never the engine-only
    // modeHint; registerAuto's strict arity would reject them
    register("dask_geomodeling.raster.spatial.Place") { args =>
      def pt(a: Any): (Double, Double) = a match {
        case s: Seq[_] if s.size == 2 =>
          (s.head.toString.toDouble, s(1).toString.toDouble)
        case p: (_, _) => (p._1.toString.toDouble, p._2.toString.toDouble)
        case other => throw new IllegalArgumentException(s"not a point: $other")
      }
      Place(args.head.asInstanceOf[RasterBlock], args(1).toString,
        pt(args(2)), args(3).asInstanceOf[Seq[Any]].map(pt),
        args.lift(4).map(_.toString).getOrElse("last"))
    }
    // the reference's combine.Group / reduction.Max serialize VARIADIC
    // member blocks (BaseCombine.__init__(*args)); collect them into the
    // engine's Seq parameter
    register("dask_geomodeling.raster.combine.Group")(args =>
      Group(args.map(_.asInstanceOf[RasterBlock])))
    register("dask_geomodeling.raster.reduction.Max")(args =>
      Max(args.map(_.asInstanceOf[RasterBlock])))
    // RasterFileSource(url, time_first, time_delta) — urls arrive as the
    // reference's safe_file_url "file://" form; format dispatch by
    // extension mirrors GDAL's driver autodetection (tif/asc/xyz/png)
    register("dask_geomodeling.raster.sources.RasterFileSource") { args =>
      RasterFileSource(args.head.toString.stripPrefix("file://"),
        args(1).toString.toDouble.toLong, args(2).toString.toDouble.toLong)
    }

    aliasAll("dask_geomodeling.geometry.field_operations", Seq(
      classOf[graft.geometry.FieldOps.Add], classOf[graft.geometry.FieldOps.Subtract],
      classOf[graft.geometry.FieldOps.Multiply], classOf[graft.geometry.FieldOps.Divide],
      classOf[graft.geometry.FieldOps.FloorDivide], classOf[graft.geometry.FieldOps.Power],
      classOf[graft.geometry.FieldOps.Modulo], classOf[graft.geometry.FieldOps.Equal],
      classOf[graft.geometry.FieldOps.NotEqual], classOf[graft.geometry.FieldOps.Greater],
      classOf[graft.geometry.FieldOps.GreaterEqual], classOf[graft.geometry.FieldOps.Less],
      classOf[graft.geometry.FieldOps.LessEqual], classOf[graft.geometry.FieldOps.And],
      classOf[graft.geometry.FieldOps.Or], classOf[graft.geometry.FieldOps.Xor],
      classOf[graft.geometry.FieldOps.Invert], classOf[graft.geometry.FieldOps.Where],
      classOf[graft.geometry.FieldOps.Mask], classOf[graft.geometry.FieldOps.Round],
      classOf[graft.geometry.FieldOps.Classify],
      classOf[graft.geometry.FieldOps.ClassifyFromColumns],
      classOf[graft.geometry.FieldOps.Interp], classOf[graft.geometry.FieldOps.Choose]))
    alias("dask_geomodeling.geometry.geom_operations.Area",
      classOf[graft.geometry.Area])
    alias("dask_geomodeling.geometry.set_operations.Difference",
      classOf[graft.geometry.Difference])
    alias("dask_geomodeling.geometry.set_operations.Intersection",
      classOf[graft.geometry.Intersection])
    alias("dask_geomodeling.geometry.constructive.Buffer",
      classOf[graft.geometry.Buffer])
    alias("dask_geomodeling.geometry.constructive.Simplify",
      classOf[graft.geometry.Simplify])
    alias("dask_geomodeling.geometry.text.ParseTextColumn",
      classOf[graft.geometry.ParseTextColumn])
    alias("dask_geomodeling.geometry.merge.MergeGeometryBlocks",
      classOf[graft.geometry.MergeGeometryBlocks])
    alias("dask_geomodeling.geometry.aggregate.AggregateRaster",
      classOf[graft.geometry.AggregateRaster])
    alias("dask_geomodeling.geometry.aggregate.AggregateRasterAboveThreshold",
      classOf[graft.geometry.AggregateRasterAboveThreshold])
    alias("dask_geomodeling.geometry.base.GetSeriesBlock",
      classOf[graft.geometry.GetSeriesBlock])
    // SetSeriesBlock serializes VARIADIC (column, value) pairs
    // (geometry/base.py:240-300); fold them into a chain
    register("dask_geomodeling.geometry.base.SetSeriesBlock") { args =>
      args.tail.grouped(2).foldLeft(args.head.asInstanceOf[graft.geometry.GeometryBlock]) {
        case (acc, Seq(name, value)) =>
          graft.geometry.SetSeriesBlock(acc, name.toString, value)
        case (_, other) => throw new IllegalArgumentException(
          s"SetSeriesBlock: dangling column without a value: $other")
      }
    }
    alias("dask_geomodeling.geometry.sources.GeometryWKTSource",
      classOf[graft.geometry.GeometryWKTSource])
    // GeometryFileSource(url, layer, id_field): the engine's codecs adopt
    // the fid column natively, so id_field needs no mapping
    register("dask_geomodeling.geometry.sources.GeometryFileSource") { args =>
      val layer = args.lift(1) match {
        case None | Some(null) | Some(None) => None
        case Some(Some(v)) => Some(v.toString)
        case Some(v) => Some(v.toString)
      }
      graft.geometry.GeometryFileSource(
        args.head.toString.stripPrefix("file://"), layer, None)
    }
    alias("dask_geomodeling.core.graphs.DummyBlock", classOf[DummyBlock])
  }

  def construct(className: String, args: Seq[Any]): Block =
    factories.get(className) match {
      case Some(f) => f(args)
      case None if className == classOf[DummyBlock].getName =>
        DummyBlock(args.head.toString)
      case None =>
        throw new IllegalArgumentException(s"unregistered block class: $className")
    }

  /** Rebuild a Block DAG from a serialized view document. */
  def fromJson(json: String): Block = fromJsonMultiple(json, Seq.empty).head

  /** `construct_multiple` (reference core/graphs.py:52-82): rebuild several
    * endpoints out of one shared graph, preserving subgraph sharing. Empty
    * `names` takes the document's own endpoint. */
  def fromJsonMultiple(json: String, names: Seq[String]): Seq[Block] = {
    registerBuiltins
    val doc = Json.parse(json).asInstanceOf[Map[String, Any]]
    require(doc.get("version").exists(v => v == 2L || v == 2), "expected version 2 view")
    val graph = doc("graph").asInstanceOf[Map[String, Any]]
    val endpoints = if (names.nonEmpty) names else Seq(doc("name").toString)
    val built = scala.collection.mutable.HashMap.empty[String, Block]
    val inProgress = scala.collection.mutable.HashSet.empty[String]
    def build(key: String): Block = built.getOrElseUpdate(key, {
      require(inProgress.add(key), s"view graph has a reference cycle through '$key'")
      val entry = graph(key).asInstanceOf[List[Any]]
      val cls = entry.head.toString
      // a DummyBlock's argument is the masqueraded NAME — a literal string
      // that typically coincides with its own graph key, never a reference
      val isDummy = cls == classOf[DummyBlock].getName ||
        cls == "dask_geomodeling.core.graphs.DummyBlock"
      val rawArgs = if (isDummy) entry.tail else entry.tail.map {
        case s: String if graph.contains(s) => build(s)
        case l: List[_] => l.map {
          case s: String if graph.contains(s) => build(s)
          case v                              => v
        }
        case v => v
      }
      inProgress.remove(key)
      BlockRegistry.construct(cls, rawArgs)
    })
    endpoints.map(build)
  }
}
