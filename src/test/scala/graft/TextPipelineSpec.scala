package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

class TextPipelineSpec extends SparkSpec {

  private def scrubOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.piiScrub(col("t"))).head.getString(0)
  }

  test("PII scrub redacts emails, IPs, card runs and phones") {
    assert(scrubOne("mail me at jo.hn+work@sub.example.co.uk today") ==
      "mail me at <EMAIL> today")
    assert(scrubOne("host 192.168.1.254 and 10.0.0.1 up") ==
      "host <IP> and <IP> up")
    assert(scrubOne("card 4111111111111111 exp 12/26") ==
      "card <NUMBER> exp 12/26")
    assert(scrubOne("call +1 (555) 123-4567 or 555-123-4567") ==
      "call <PHONE> or <PHONE>")
    // order interactions: an IP must not half-match as a phone, a 16-digit
    // run must not become a phone
    assert(!scrubOne("ip 172.16.254.3").contains("<PHONE>"))
    assert(scrubOne("acct 12345678901234").contains("<NUMBER>"))
    // short digit runs survive
    assert(scrubOne("room 1234 floor 9") == "room 1234 floor 9")
  }

  test("tf-idf top-k ranks by score then term, with smoothed idf") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple apple banana"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rnk").collect()
    def idf(df: Long): Double = math.log(4.0 / (df + 1.0)) + 1.0
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    // doc 0: apple tf=2 df=1 → 2*(ln(2)+1); banana tf=1 df=2
    val row0 = out.filter(_.getLong(0) == 0L)
    assert(row0.map(_.getString(1)).toSeq == Seq("apple", "banana"))
    assert(row0.head.getDouble(4) == r6(2 * idf(1)))
    // doc 2: cherry tf=3 beats date tf=1
    val row2 = out.filter(_.getLong(0) == 2L)
    assert(row2.map(_.getString(1)).toSeq == Seq("cherry", "date"))
    assert(row2.head.getDouble(4) == r6(3 * idf(2)))
    // doc 1: equal tf=1; banana df=2 == cherry df=2 → tie on score,
    // lexicographic term order breaks it
    val row1 = out.filter(_.getLong(0) == 1L)
    assert(row1.map(_.getString(1)).toSeq == Seq("banana", "cherry"))
    assert(row1.map(_.getLong(5)).toSeq == Seq(1L, 2L))
  }

  test("PII scrub is stateless and runs unchanged on a stream") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = QueryLib.tbl(spark, dir, "documents").limit(50)
    val expected = docs.select(col("doc_id"),
      TextAnalysis.piiScrub(col("text")).as("clean")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamDir = java.nio.file.Files.createTempDirectory("graft_pii_stream")
    docs.write.parquet(streamDir.toString + "/part")
    val src = spark.readStream.schema(docs.schema)
      .parquet(streamDir.toString + "/part")
    val q = src.select(col("doc_id"), TextAnalysis.piiScrub(col("text")).as("clean"))
      .writeStream.outputMode("append").format("memory")
      .queryName("pii_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pii_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected && got.size == 50)
    } finally q.stop()
  }
}
