package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). Round-14 focus:
  * the StreamNearDedup explicit-`ttlMs` state contract — both spellings
  * (positive TTL = trailing-window admission; `HistoryExact` = documented
  * unbounded opt-in) driven through a live MemoryStream query.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamNearDedup

    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the band plays a very long tune about nothing at all"
    val fresh = "completely different content about maritime navigation " +
      "charts and the tides that govern safe passage through the strait"

    // ---- contract spelling 1: HistoryExact (explicit unbounded opt-in)
    {
      val stream = MemoryStream[(Long, String)](spark)
      val got = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
      val q = StreamNearDedup.verdicts(
          stream.toDF().toDF("doc_id", "text"),
          ttlMs = StreamNearDedup.HistoryExact)
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamNearDedup.Verdict],
            _: Long) =>
          StreamNearDedup.decide(b).collect().foreach(r =>
            got.put(r.getLong(0), r.getBoolean(1)))
          ()
        }.start()
      try {
        stream.addData(Seq(1L -> base)); q.processAllAvailable()
        stream.addData(Seq(2L -> base)); q.processAllAvailable() // dup, later batch
        stream.addData(Seq(3L -> fresh)); q.processAllAvailable()
      } finally q.stop()
      import scala.jdk.CollectionConverters._
      println(s"history-exact: ${got.asScala.toMap} " +
        s"(want 1->true 2->false 3->true)")
      assert(got.asScala.toMap == Map(1L -> true, 2L -> false, 3L -> true))
    }

    // ---- contract spelling 2: positive TTL (claims expire)
    {
      val stream = MemoryStream[(Long, String)](spark)
      val got = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
      val ttlMs = 3000L
      val q = StreamNearDedup.verdicts(
          stream.toDF().toDF("doc_id", "text"), ttlMs = ttlMs)
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamNearDedup.Verdict],
            _: Long) =>
          StreamNearDedup.decide(b).collect().foreach(r =>
            got.put(r.getLong(0), r.getBoolean(1)))
          ()
        }.start()
      def awaitDoc(id: Long): Unit = {
        val t0 = System.nanoTime
        while (!got.containsKey(id) && System.nanoTime - t0 < 60e9.toLong)
          Thread.sleep(50)
        assert(got.containsKey(id), s"doc $id not decided within 60s")
      }
      try {
        stream.addData(Seq(1L -> base)); awaitDoc(1L)
        stream.addData(Seq(2L -> base)); awaitDoc(2L) // in-window dup: rejected
        Thread.sleep(ttlMs + 800)
        stream.addData(Seq(3L -> base)); awaitDoc(3L) // claim expired: admitted
      } finally q.stop()
      import scala.jdk.CollectionConverters._
      println(s"ttl-window: ${got.asScala.toMap} " +
        s"(want 1->true 2->false 3->true)")
      assert(got.asScala.toMap == Map(1L -> true, 2L -> false, 3L -> true))
    }

    // ---- negative TTL rejected loudly
    val err = try {
      StreamNearDedup.verdicts(Seq(1L -> base).toDF("doc_id", "text"),
        ttlMs = -5L); "NO ERROR"
    } catch { case e: IllegalArgumentException => e.getMessage }
    println(s"negative-ttl: $err")
    assert(err.contains("ttlMs"))

    // ---- static one-batch path (internally pins HistoryExact)
    val stat = StreamNearDedup(
      Seq(1L -> base, 2L -> base, 3L -> fresh).toDF("doc_id", "text"))
      .collect().map(d => d.doc_id -> d.admitted).toMap
    println(s"static: $stat (want 1->true 2->false 3->true)")
    assert(stat == Map(1L -> true, 2L -> false, 3L -> true))

    println("scratch r14: StreamNearDedup state contract OK")
    spark.stop()
  }
}
