package graft

import graft.pipeline.{Lines, Sampling}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal, exact-substring window dedup, and
  * the per-source cap — hand-computed fixtures. */
class LinesSpec extends SparkSpec {

  test("dropBoilerplate removes shared lines, reassembles in order") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha\nshared footer\nbeta"),
      (2L, "gamma\nshared footer"),
      (3L, "shared footer"),
      (4L, "solo line")).toDF("doc_id", "text")
    val out = Lines.dropBoilerplate(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "alpha\nbeta", 2L, 1L),
      (2L, "gamma", 1L, 1L),
      (3L, "", 0L, 1L),       // fully-boilerplate doc survives, empty
      (4L, "solo line", 1L, 0L)))
  }

  test("dropBoilerplate counts DISTINCT documents, not occurrences") {
    val sp = spark
    import sp.implicits._
    // "twice" appears twice in ONE doc -> not boilerplate at minDocs=2
    val docs = Seq(
      (1L, "twice\nmid\ntwice"),
      (2L, "other")).toDF("doc_id", "text")
    val out = Lines.dropBoilerplate(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "twice\nmid\ntwice")
  }

  test("windowDupStats: ownership, merged spans, short docs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "abcdefgh"),   // owner of every window it contains
      (2L, "xxabcdyy"),   // one duplicated window "abcd" at pos 2
      (3L, "ppabcdefqq"), // "abcd","bcde","cdef" dup -> one 6-char span
      (4L, "zz")          // shorter than w: zero windows
    ).toDF("doc_id", "text")
    val out = Lines.windowDupStats(docs, "doc_id", "text", w = 4, stride = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, 0L, 0L),
      (2L, 5L, 1L, 4L),
      (3L, 7L, 3L, 6L),
      (4L, 0L, 0L, 0L)))
  }

  test("windowDupStats: disjoint duplicated spans stay separate islands") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "abcd0000efgh"),
      (2L, "abcd1111efgh")  // two 4-char dup spans, 4 apart -> 8 chars
    ).toDF("doc_id", "text")
    val out = Lines.windowDupStats(docs, "doc_id", "text", w = 4, stride = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 2L, 8L)))
  }

  test("removeDupSpans cuts merged spans, keeps the first occurrence") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "abcdefgh"),        // owner: untouched
      (2L, "xxabcdyy"),        // loses "abcd" -> "xxyy"
      (3L, "ppabcdefqq"),      // loses the merged "abcdef" -> "ppqq"
      (4L, "abcd"),            // whole doc duplicated -> empty
      (5L, "zz")               // shorter than w: untouched
    ).toDF("doc_id", "text")
    val out = Lines.removeDupSpans(docs, "doc_id", "text", w = 4, stride = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "abcdefgh", 0L),
      (2L, "xxyy", 4L),
      (3L, "ppqq", 6L),
      (4L, "", 4L),
      (5L, "zz", 0L)))
  }

  test("removeDupSpans stitches multiple disjoint gaps in order") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "abcd0000efgh1111"),
      (2L, "abcd2222efgh3333")  // loses abcd AND efgh, keeps the rest
    ).toDF("doc_id", "text")
    val out = Lines.removeDupSpans(docs, "doc_id", "text", w = 4, stride = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "abcd0000efgh1111", 0L),
      (2L, "22223333", 8L)))
  }

  test("sourceCap ranks deterministically and caps per source") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 30L).map(i => (i, if (i <= 20) "a" else "b"))
      .toDF("doc_id", "source")
    val out = Sampling.sourceCap(docs, "doc_id", "source", 5)
    val kept = out.filter(col("kept")).groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kept == Map("a" -> 5L, "b" -> 5L))
    // ranks are a permutation of 1..n within each source
    val ranksA = out.filter(col("source") === "a").select("src_rank")
      .collect().map(_.getLong(0)).sorted
    assert(ranksA.toSeq == (1L to 20L))
    // determinism: the same input gives the same keep set
    val again = Sampling.sourceCap(docs, "doc_id", "source", 5)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val first = out.filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == first)
  }
}
