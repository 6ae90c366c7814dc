package graft.core

import java.security.MessageDigest

/** Deterministic content token for Block DAG nodes.
  *
  * Mirrors the role of dask's `tokenize` in the reference
  * (dask_geomodeling/core/graphs.py:101-113): a stable content hash of the
  * class import path plus the tokens of all constructor args, used for node
  * identity, graph-key naming and plan caching. Cross-compatibility with the
  * Python token values is not required (SURVEY §7.4.5) — only internal
  * determinism across JVMs/sessions, which is why this is a SHA-1 of a
  * canonical string rather than `hashCode`.
  */
object Token {

  def of(className: String, args: Seq[Any]): String = {
    val sb = new StringBuilder
    sb.append(className)
    args.foreach { a => sb.append('|'); canonical(a, sb) }
    sha1(sb.toString)
  }

  /** Canonical, type-tagged string form of an argument value. */
  private def canonical(a: Any, sb: StringBuilder): Unit = a match {
    case null             => sb.append("null")
    case b: Block         => sb.append("blk:").append(b.token)
    case s: String        => sb.append("str:").append(s)
    case b: Boolean       => sb.append("bool:").append(b)
    case i: Int           => sb.append("num:").append(i.toLong)
    case l: Long          => sb.append("num:").append(l)
    case d: Double        => // integral doubles hash like their long form so
      // e.g. Mask(value=5) == Mask(value=5.0), matching Python number
      // equality — but only when the long form round-trips: whole doubles
      // >= 2^63 (Float/Double.MaxValue nodata sentinels) would all clamp to
      // Long.MaxValue and collide distinct blocks onto one token.
      if (d.isWhole && !d.isInfinite && d == d.toLong.toDouble &&
          math.abs(d) < 9.2e18) sb.append("num:").append(d.toLong)
      else sb.append("dbl:").append(java.lang.Double.doubleToLongBits(d))
    case f: Float         => canonical(f.toDouble, sb)
    case i: java.time.Instant => sb.append("ts:").append(i.toEpochMilli)
    case o: Option[_]     =>
      o match {
        case Some(v) => sb.append("some:"); canonical(v, sb)
        case None    => sb.append("none")
      }
    case m: scala.collection.Map[_, _] =>
      sb.append("map{")
      m.toSeq.map { case (k, v) =>
        val ksb = new StringBuilder; canonical(k, ksb)
        val vsb = new StringBuilder; canonical(v, vsb)
        ksb.toString + "=" + vsb.toString
      }.sorted.foreach { s => sb.append(s).append(',') }
      sb.append('}')
    case it: Iterable[_]  =>
      sb.append("seq[")
      it.foreach { v => canonical(v, sb); sb.append(',') }
      sb.append(']')
    case arr: Array[_]    => canonical(arr.toSeq, sb)
    case p: Product       =>
      sb.append("prod:").append(p.productPrefix).append('(')
      p.productIterator.foreach { v => canonical(v, sb); sb.append(',') }
      sb.append(')')
    case other            => sb.append("any:").append(other.toString)
  }

  private def sha1(s: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(32)
  }
}
