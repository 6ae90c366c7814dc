package graft

import org.apache.spark.sql.functions._
import graft.pipeline.IntervalJoin

class IntervalJoinSpec extends SparkSpec {

  test("countContaining: inclusive bounds, zeros kept, exact counts") {
    val sp = spark
    import sp.implicits._
    val points = Seq(
      (1L, 10L, 100L),  // inside both intervals of key 10
      (2L, 10L, 250L),  // inside the second only
      (3L, 10L, 999L),  // inside none
      (4L, 20L, 100L),  // key with no intervals
      (5L, 10L, 50L),   // exactly on a start bound (inclusive)
      (6L, 10L, 300L))  // exactly on an end bound (inclusive)
      .toDF("pid", "k", "us")
    val intervals = Seq(
      (10L, 50L, 150L),
      (10L, 90L, 300L),
      (30L, 0L, 1000L)) // other key: never matches
      .toDF("k", "s", "e")
    val out = IntervalJoin.countContaining(points, "pid", "k", "us",
        intervals, "k", "s", "e", bucketUs = 100L)
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_active")))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 0L), (4L, 0L),
      (5L, 1L), (6L, 1L)))
  }

  test("pairs: each in-range pair appears exactly once across buckets") {
    val sp = spark
    import sp.implicits._
    // interval spans many buckets; the point meets it in exactly one
    val points = Seq((1L, 7L, 499L), (2L, 7L, 1L)).toDF("pid", "k", "us")
    val intervals = Seq((7L, 0L, 500L)).toDF("k", "s", "e")
    val out = IntervalJoin.pairs(points, "pid", "k", "us",
      intervals, "k", "s", "e", bucketUs = 10L)
    assert(out.count() == 2L)
    assert(out.groupBy("pid").count().agg(max("count"))
      .collect()(0).getLong(0) == 1L)
  }

  test("random sweep: bucketed join matches the brute-force reference") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (bucketUs <- Seq(7L, 64L, 1000L)) {
      val points = Seq.tabulate(200)(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(10000).toLong))
      val intervals = Seq.fill(120) {
        val s = rnd.nextInt(10000).toLong
        (rnd.nextInt(8).toLong, s, s + rnd.nextInt(500).toLong)
      }
      val want = points.map { case (pid, k, us) =>
        pid -> intervals.count(iv =>
          iv._1 == k && us >= iv._2 && us <= iv._3).toLong
      }.toMap
      val got = IntervalJoin.countContaining(
          points.toDF("pid", "k", "us"), "pid", "k", "us",
          intervals.toDF("k", "s", "e"), "k", "s", "e", bucketUs)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_active")).toMap
      assert(got == want, s"bucketUs=$bucketUs")
    }
  }

  test("degenerate interval fan-out fails loudly in the executors") {
    val sp = spark
    import sp.implicits._
    val points = Seq((1L, 7L, 5L)).toDF("pid", "k", "us")
    val intervals = Seq((7L, 0L, 100000L)).toDF("k", "s", "e")
    val e = intercept[Exception] {
      IntervalJoin.countContaining(points, "pid", "k", "us",
        intervals, "k", "s", "e", bucketUs = 10L,
        maxBucketsPerInterval = 16).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("raise bucketUs")), e.getMessage)
  }

  test("working columns never collide with caller columns (r10 ADVICE)") {
    val sp = spark
    import sp.implicits._
    // points already carry every internal working name the old code
    // hardcoded: counts must still be exact and the caller's columns
    // must survive untouched
    val points = Seq(
      (1L, 10L, 100L, "a", 7L, 8L, 9L, 11L),
      (2L, 10L, 999L, "b", 7L, 8L, 9L, 11L))
      .toDF("pid", "k", "us", "_pid", "_bucket", "_k", "_s", "_n_active")
    val intervals = Seq((10L, 50L, 150L)).toDF("k", "s", "e")
    val out = IntervalJoin.countContaining(points, "pid", "k", "us",
      intervals, "k", "s", "e", bucketUs = 100L)
    val rows = out.orderBy("pid").collect()
    assert(rows.map(r => (r.getAs[Long]("pid"), r.getAs[Long]("n_active")))
      .toSeq == Seq((1L, 1L), (2L, 0L)))
    // caller columns preserved, values intact
    assert(rows(0).getAs[String]("_pid") == "a")
    assert(rows(0).getAs[Long]("_bucket") == 7L)
    assert(rows(0).getAs[Long]("_k") == 8L)
    assert(rows(0).getAs[Long]("_n_active") == 11L)
    // the documented OUTPUT name colliding is a loud contract error
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.countContaining(
        points.withColumnRenamed("_s", "n_active"), "pid", "k", "us",
        intervals, "k", "s", "e", bucketUs = 100L)
    }
    assert(e.getMessage.contains("n_active"), e.getMessage)
  }
}
