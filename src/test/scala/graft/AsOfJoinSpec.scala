package graft

import graft.pipeline.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of join: inclusive boundary, latest wins, no-match null") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // exactly at state2 → inclusive
      (2L, 100L, ts("2024-01-01 10:30:00")), // between state2 and state3
      (3L, 100L, ts("2024-01-01 08:00:00")), // before any state → null
      (4L, 200L, ts("2024-01-01 12:00:00")), // other key
      (5L, 300L, ts("2024-01-01 12:00:00"))  // key with no right rows
    ).toDF("eid", "k", "t")
    val right = Seq(
      (100L, ts("2024-01-01 09:00:00"), "s1"),
      (100L, ts("2024-01-01 10:00:00"), "s2"),
      (100L, ts("2024-01-01 11:00:00"), "s3"),
      (200L, ts("2024-01-01 11:59:00"), "s4")
    ).toDF("rk", "rt", "state")
    val out = AsOfJoin.backward(left, "k", "t", right, "rk", "rt")
      .select(col("eid"), col("state"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("s2"), 2L -> Some("s2"), 3L -> None,
      4L -> Some("s4"), 5L -> None))
  }
}
