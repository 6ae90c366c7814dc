package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Bpe

class BpeSpec extends SparkSpec {

  /** The Sennrich et al. worked corpus: low×5, lower×2, newest×6,
    * widest×3 (one word per doc occurrence keeps frequencies exact). */
  private def corpus = {
    import spark.implicits._
    val ws = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("train learns the paper's merges deterministically") {
    val m = Bpe.train(corpus, "text", 4)
    // pair counts: (e,s)=9 ties (s,t</w>)=9 → lexicographic; then the
    // merged (es,t</w>)=9; then (l,o)=7; then the 6-way tie resolves to
    // (e,w) over (n,e) and (w,est</w>)
    assert(m.merges == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")))
    val m2 = Bpe.train(corpus, "text", 4)
    assert(m2.merges == m.merges)
  }

  test("encode replays merges by rank; concatenation is lossless") {
    val m = Bpe.train(corpus, "text", 4)
    assert(Bpe.encodeWord(m, "lowest") == Seq("lo", "w", "est</w>"))
    assert(Bpe.encodeWord(m, "newest") == Seq("n", "ew", "est</w>"))
    assert(Bpe.encodeWord(m, "low") == Seq("lo", "w</w>"))
    // unseen word falls back to chars + whatever merges apply
    assert(Bpe.encodeWord(m, "apple").mkString
      .replace("</w>", "") == "apple")
    import spark.implicits._
    val docs = Seq((0L, "the lowest newest low"), (1L, ""),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1).mkString.replace("</w>", "") ==
      "thelowestnewestlow")
    assert(out(0).getLong(2) ==
      3 + 3 + 3 + 2) // the|lowest|newest|low token counts
    assert(out(1).getLong(2) == 0 && out(2).getLong(2) == 0)
  }

  test("invariants match the word layer; dictionary cap is loud") {
    import spark.implicits._
    val docs = Seq((0L, "Alpha beta GAMMA!"), (1L, "x y"), (2L, ""))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", 10)
    val inv = Bpe.invariants(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    assert(inv(0).getAs[Long]("n_words") == 3)
    assert(inv(0).getAs[Long]("n_chars") == 14) // alpha+beta+gamma
    assert(inv(1).getAs[Long]("n_words") == 2 &&
      inv(1).getAs[Long]("n_chars") == 2)
    assert(inv(2).getAs[Long]("n_words") == 0 &&
      inv(2).getAs[Long]("n_chars") == 0)
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", 5, maxDictWords = 3)
    }
    assert(e.getMessage.contains("distinct words"))
  }
}
