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

  final lazy val token: String = Token.of(getClass.getName, args)

  /** Graph key, mirroring the reference's `name = "{Class}_{token}"`
    * (core/graphs.py:220-222). */
  final def graphName: String = s"${getClass.getSimpleName}_$token"

  def children: Seq[Block] = args.collect { case b: Block => b }

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
  * after `DummyBlock` (core/graphs.py:293-308). */
case class DummyBlock(dummyName: String) extends Block

/** Registry of Block constructors for deserializing JSON v2 views
  * (the role of `construct` / `construct_multiple`, core/graphs.py:52-82).
  * Operators self-register a `Seq[Any] => Block` factory keyed by class name.
  */
object BlockRegistry {
  private val factories =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Any] => Block]

  def register(className: String)(f: Seq[Any] => Block): Unit =
    factories(className) = f

  def construct(className: String, args: Seq[Any]): Block =
    factories.get(className) match {
      case Some(f) => f(args)
      case None if className == classOf[DummyBlock].getName =>
        DummyBlock(args.head.toString)
      case None =>
        throw new IllegalArgumentException(s"unregistered block class: $className")
    }

  /** Rebuild a Block DAG from a serialized view document. */
  def fromJson(json: String): Block = {
    val doc = Json.parse(json).asInstanceOf[Map[String, Any]]
    require(doc.get("version").exists(v => v == 2L || v == 2), "expected version 2 view")
    val graph = doc("graph").asInstanceOf[Map[String, Any]]
    val endpoint = doc("name").toString
    val built = scala.collection.mutable.HashMap.empty[String, Block]
    def build(key: String): Block = built.getOrElseUpdate(key, {
      val entry = graph(key).asInstanceOf[List[Any]]
      val cls = entry.head.toString
      val rawArgs = entry.tail.map {
        case s: String if graph.contains(s) => build(s)
        case v                              => v
      }
      BlockRegistry.construct(cls, rawArgs)
    })
    build(endpoint)
  }
}
