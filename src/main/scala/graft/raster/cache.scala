package graft.raster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.core.Block

/** Token-keyed frame cache (SURVEY §4): the deterministic Block token plus
  * the request identify a tile frame uniquely, so expensive source reshapes
  * (e.g. `TableRasterSource`'s collect_list shuffle) can be persisted once
  * per session and reused by every query over the same source+request —
  * the Spark-native analogue of the reference's `cached` dask graphs.
  *
  * Bounded LRU (default 32 frames — the full bench session touches ~20
  * distinct source-frame variants, so 16 thrashed); evicted entries are
  * unpersisted. Scoped per SparkSession so frames never leak across
  * sessions. Disable with `spark.graft.frameCache=false`; size with
  * `-Dgraft.frameCache.maxEntries=N`.
  */
object FrameCache {
  private val MaxEntries =
    sys.props.get("graft.frameCache.maxEntries").map(_.toInt).getOrElse(32)

  private final case class Key(sessionId: Int, token: String, req: RasterRequest)

  private def safeUnpersist(df: DataFrame): Unit =
    try df.unpersist(false)
    catch { case _: Exception => } // session already stopped

  private val cache =
    new java.util.LinkedHashMap[Key, DataFrame](MaxEntries, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Key, DataFrame]): Boolean = {
        val evict = size() > MaxEntries
        if (evict) safeUnpersist(e.getValue)
        evict
      }
    }

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.frameCache").forall(_.toBoolean)

  // observability hooks (specs assert containment hits; cheap enough to
  // keep on unconditionally)
  private[graft] val hitCount = new java.util.concurrent.atomic.AtomicLong
  private[graft] val missCount = new java.util.concurrent.atomic.AtomicLong

  /** Return the persisted frame for (block, req), building it on miss. */
  def cached(block: Block, req: RasterRequest)(build: => DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    if (!enabled(spark)) build
    else {
      val k = Key(System.identityHashCode(spark), block.token, req)
      cache.synchronized {
        val hit = cache.get(k)
        // never serve a frame bound to a stopped session (identity-hash
        // reuse after GC could otherwise alias a dead session's entry)
        if (hit != null && !hit.sparkSession.sparkContext.isStopped) {
          hitCount.incrementAndGet(); hit
        } else {
          if (hit != null) cache.remove(k)
          missCount.incrementAndGet()
          val df = build.persist(StorageLevel.MEMORY_AND_DISK)
          cache.put(k, df)
          df
        }
      }
    }
  }

  /** Drop and unpersist everything (test hygiene). */
  def clear(): Unit = cache.synchronized {
    val it = cache.values().iterator()
    while (it.hasNext) { safeUnpersist(it.next()); it.remove() }
  }
}
