package graft

import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming windowed aggregation matches the batch plan") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStream.batch(spark, dir, "1 hour").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // the file stream source needs a directory; stage a link to the table
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val q = EventStream.streaming(spark, streamDir.toString, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_agg").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_agg").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
