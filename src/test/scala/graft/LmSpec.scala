package graft

import graft.pipeline.Lm

class LmSpec extends SparkSpec {

  test("bigramPerplexity matches the hand-computed add-one model") {
    import spark.implicits._
    // corpus: doc0 "a b a", doc1 "b a"
    // bigrams (BOS-prepended): doc0 (<s>,a)(a,b)(b,a); doc1 (<s>,b)(b,a)
    // model: cb(<s>,a)=1 cb(a,b)=1 cb(b,a)=2 cb(<s>,b)=1
    //        cu(<s>)=2 cu(a)=1 cu(b)=2; V = |{a,b}| = 2
    // doc0 terms: ln(2/4), ln(2/3), ln(3/4) → micro-nats
    //   floor: -693148, -405466, -287683 → nll_micro 1386297
    // doc1 terms: ln(2/4), ln(3/4) → -693148, -287683 → 980831
    val docs = Seq((0L, "a b a"), (1L, "b a")).toDF("doc_id", "text")
    val out = Lm.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 1386297L)
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 980831L)
    // integer micro-nat averages: floor(1386297/3), floor(980831/2)
    assert(out(0).getLong(3) == 462099L)
    assert(out(1).getLong(3) == 490415L)
  }

  test("bigramPerplexity drops wordless and null documents") {
    import spark.implicits._
    val docs = Seq((0L, "only one-doc has, words!"), (1L, "  ... "),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Lm.bigramPerplexity(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    // "only one doc has words" → 5 words → 5 bigrams incl the BOS one
    assert(out(0).getLong(1) == 5L)
  }

  test("bigramPerplexity ranks repetitive text as more predictable") {
    import spark.implicits._
    // a doc made of one repeated bigram must score lower avg-NLL than a
    // doc of all-distinct words against the same corpus model
    val docs = Seq((0L, "x y x y x y x y x y"),
      (1L, "q w e r t z u i o p")).toDF("doc_id", "text")
    val m = Lm.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).getLong(3) < m(1).getLong(3))
  }

  test("trigramPerplexity: interpolated probabilities sum the hand model") {
    import spark.implicits._
    // corpus: one doc "a b". trigrams (<s>,<s>,a), (<s>,a,b).
    // all context counts are 1, N=2, V=2 → per-token
    // p = 0.5·1 + 0.3·1 + 0.15·(1/2) + 0.05/2 = 0.9
    val docs = Seq((0L, "a b")).toDF("doc_id", "text")
    val out = Lm.trigramPerplexity(docs, "doc_id", "text").head()
    assert(out.getLong(1) == 2L)
    val tm = math.floor(math.log(
      0.5 * 1.0 + 0.3 * 1.0 + 0.15 * 0.5 + 0.05 / 2.0) * 1e6).toLong
    assert(out.getLong(2) == -2 * tm)
    // repeated text scores as more predictable than novel text
    val two = Seq((0L, "x y x y x y"), (1L, "q w e r t z"))
      .toDF("doc_id", "text")
    val m = Lm.trigramPerplexity(two, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).getLong(3) < m(1).getLong(3))
  }
}
