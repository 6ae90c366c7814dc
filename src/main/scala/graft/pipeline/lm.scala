package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the CCNet-style "perplexity
  * filter" stage of a training-data pipeline (Wenzek et al. 2020 score
  * documents with a KenLM 5-gram model; this engine trains the model on
  * the corpus itself with a bounded, SQL-reproducible smoother so the
  * whole stage stays inside the cluster and inside the oracle gate).
  *
  * Model: word-bigram LM with add-one (Laplace) smoothing and a BOS
  * marker, P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V). Scores are exchanged as
  * INTEGER micro-nats (floor(ln(p)*1e6)) so every aggregation is
  * order-independent integer arithmetic — two engines summing in
  * different orders still agree bit-for-bit; the single float division
  * happens once, at the very end, on identical integers.
  *
  * Scale shape (100 TB lens): the model table is one map-side-combined
  * hash aggregate of the exploded instance stream (never broadcast by
  * construction — a web-scale n-gram table has billions of rows, though
  * the planner is free to broadcast a small one); scoring joins the
  * instance stream against the model ONCE and the per-doc aggregate
  * map-side combines contiguous instances back to per-doc partials, so
  * the corpus crosses the network in exactly one place; the vocabulary
  * size is a 1-row broadcast. No driver-side state of model size
  * anywhere.
  */
object Lm {

  private val BOS = "<s>"

  /** Word list with the BOS marker prepended; null text behaves like an
    * empty document on both engines (coalesce keeps Spark's null-array
    * semantics aligned with DuckDB's list_prepend-on-NULL). */
  private def bosWords(text: Column): Column =
    concat(array(lit(BOS)), coalesce(TextAnalysis.words(text), array()))

  /** Per-document bigram-LM negative log-likelihood and average NLL in
    * MICRO-nats (perplexity = exp(avg_nll_micro / 1e6)). Documents with
    * no words are dropped (no bigram to score). Output: doc_id,
    * n_bigrams, nll_micro, avg_nll_micro. The average stays integer
    * (floor of an IEEE division of identical integers — bit-exact on any
    * engine); a round()ed float average is NOT engine-reproducible:
    * Spark rounds the shortest decimal rendering half-up while DuckDB
    * rounds the binary double, so 7th-digit ties diverge. */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val withWs = docs
      .select(col(idCol).as("doc_id"), bosWords(col(textCol)).as("ws"))
      .where(size(col("ws")) >= 2)
    val bg = withWs.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("ws")) - 1), i =>
        struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    // model-sized corpus bigram table, read by THREE consumers (mc, v,
    // the terms join): materialized once so each branch stops re-running
    // the corpus explode+aggregate — the trigram lesson (NOTES_r14)
    // applied to the same shape here
    // corpus bigram totals straight off the instance stream: the count
    // of exploded instances per (w1, w2) ≡ the former sum over docs of
    // per-doc counts — one corpus exchange in the checkpoint pass
    // instead of two
    val mb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint()
    val v = mb.select(countDistinct("w2").as("vv"))
    // attach the context total cu as a WINDOW sum over the checkpointed
    // model table (sum of cb per w1 ≡ the former mc aggregate — same
    // integer sum, order-independent), then join the corpus frame ONCE
    // on (w1, w2). The former shape joined the corpus-sized `g` through
    // mb THEN mc — two corpus-sized exchanges (the second re-keyed on
    // w1) for counts that only depend on the bigram; now only the
    // model-sized frame re-keys, and the corpus crosses the network
    // once. The window (not a join, not a crossJoin) also keeps the
    // model side's size estimate anchored to the checkpoint's EXACT
    // stats, so on small inputs the planner broadcasts the model —
    // never the corpus — and at scale it shuffle-joins. The 1-row vv
    // frame attaches after the corpus join exactly as before, and tm is
    // the same IEEE expression on the same integers → bit-identical.
    val model = mb.withColumn("cu",
      sum(col("cb")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("w1")))
    // score the INSTANCE stream directly (r17): the former per-doc
    // (doc, bigram) pre-aggregate's only remaining consumer was this
    // join (the model tables read the instance stream since r16), and
    // it bought one corpus-sized 3-column-keyed exchange for a
    // compression factor of only the within-doc duplicate-bigram rate.
    // Joining instances is integer-identical: summing tm once per
    // instance ≡ the former cnt·tm on longs (exact multiplication-as-
    // repeated-addition), and n_bigrams = count(instances) ≡ sum(cnt).
    // The final doc aggregate map-side combines the contiguous per-doc
    // instances back to one partial row per (doc, partition) before its
    // exchange, so the doc-keyed shuffle ships the same ~#docs rows as
    // before — the corpus now crosses the network in ONE place (the
    // model join; a broadcast-able model removes even that).
    val terms = bg.join(model, Seq("w1", "w2"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        floor(log((col("cb").cast("double") + lit(1.0)) /
          (col("cu").cast("double") + col("vv").cast("double"))) *
          lit(1000000.0)).as("tm"))
    terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("tm"))).as("nll_micro"))
      .withColumn("avg_nll_micro",
        floor(col("nll_micro").cast("double") /
          col("n_bigrams").cast("double")))
  }

  /** Jelinek-Mercer interpolated TRIGRAM LM (the classic smoothed n-gram
    * of Jelinek & Mercer 1980 / the KenLM family's simpler cousin):
    * p(w3|w1w2) = λ₃·c(w1w2w3)/c(w1w2·) + λ₂·c(·w2w3)/c(·w2·) +
    * λ₁·c(··w3)/N + λ₀/V, all counts derived from the ONE corpus
    * trigram multiset (two BOS markers per document) so a SQL engine
    * replays the whole model from a single base aggregate. Fixed
    * weights λ = (0.5, 0.3, 0.15, 0.05).
    *
    * Reproducibility discipline as [[bigramPerplexity]]: every ratio is
    * an identical IEEE division of identical integers on both engines;
    * the per-token term becomes an integer micro-nat, sums are
    * order-independent, and the final average is a floor of an integer
    * division. Scale shape: hash aggregates of the trigram frame + four
    * shuffle equi-joins against count tables that are never broadcast
    * (web-scale trigram tables don't fit a node); totals/vocabulary are
    * a 1-row broadcast. */
  def trigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      l3: Double = 0.5, l2: Double = 0.3, l1: Double = 0.15,
      l0: Double = 0.05): DataFrame = {
    val withWs = docs
      .select(col(idCol).as("doc_id"),
        concat(array(lit(BOS), lit(BOS)),
          coalesce(TextAnalysis.words(col(textCol)), array())).as("ws"))
      .where(size(col("ws")) >= 3)
    val tg = withWs.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("ws")) - 2), i =>
        struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2"),
          element_at(col("ws"), i + 2).as("w3")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"), col("p.w3"))
    // the corpus trigram table is read by FIVE derived aggregates and
    // the final join; left lazy, every branch of that tree recomputes
    // the whole explode+aggregate from the raw text (the sf1 soak
    // measured x69 on x10 data, 19 GB of duplicated shuffles).
    // Materialize it once: c3 is MODEL-sized (distinct trigrams), not
    // corpus-sized like `g`, so this is the spill-safe table to pin —
    // the same trade jaccardPairFrame makes (ContextCleaner reclaims
    // the blocks when the frame becomes unreachable).
    // instance counts per trigram ≡ the former sum over docs of per-doc
    // counts — one corpus exchange in the checkpoint pass instead of two
    val c3 = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      .localCheckpoint()
    // totals straight off the trigram multiset: Σ c3 ≡ the former
    // Σ_{w3} c1 (both sum every trigram occurrence once); vv unchanged
    val tot = c3.agg(sum("c3").as("n"), countDistinct("w3").as("vv"))
    // attach all four context totals as WINDOW sums over the
    // checkpointed model table — each window partition sums c3 over
    // exactly the rows the former aggregate-and-join attached
    // (c2ctx per (w1,w2), cbg per (w2,w3), c1ctx per w2, c1 per w3;
    // integer sums, order-independent) — then join the corpus frame
    // ONCE on (w1, w2, w3). The former shape dragged the corpus-sized
    // `g` through five joins — five corpus-sized exchanges, each
    // re-keyed (w1w2w3 → w1w2 → w2w3 → w2 → w3) — for counts that only
    // depend on the trigram; now only the model-sized frame re-keys,
    // and the corpus crosses the network once. Windows (not joins, no
    // crossJoin on the model side) keep the model's size estimate
    // anchored to the checkpoint's EXACT stats: on small inputs the
    // planner broadcasts the model — never the corpus — and at scale
    // it shuffle-joins. The 1-row tot attaches after the corpus join
    // exactly as before; tm is the same IEEE interpolation on the same
    // integers → bit-identical.
    // NOTE (r17, measured): the four windows do NOT cost four exchanges —
    // the optimizer's TransposeWindow + EnsureRequirements already plan
    // this as TWO exchanges, E(w2) → [W(w2), W(w1,w2)] → E(w3) → [W(w3),
    // W(w2,w3)], because hashpartitioning(w2)/(w3) satisfies the
    // clustering of every window whose keys contain it. An explicit
    // reorder that put three windows on the w2 exchange kept the same
    // 2-exchange count but shipped one extra column through E(w3) —
    // reverted (plans/r17/p38_trigram_perplexity_{before,after-reorder}).
    import org.apache.spark.sql.expressions.Window
    val model = c3
      .withColumn("c2ctx", sum(col("c3")).over(Window.partitionBy("w1", "w2")))
      .withColumn("cbg", sum(col("c3")).over(Window.partitionBy("w2", "w3")))
      .withColumn("c1ctx", sum(col("c3")).over(Window.partitionBy("w2")))
      .withColumn("c1", sum(col("c3")).over(Window.partitionBy("w3")))
    // score the INSTANCE stream directly (r17, same reasoning as the
    // bigram path): the per-doc (doc, trigram) pre-aggregate's only
    // remaining consumer was this join; dropping it removes a
    // corpus-sized 4-column-keyed exchange, the doc aggregate map-side
    // combines the contiguous instances to per-doc partials, and the
    // integers are identical (tm summed once per instance ≡ cnt·tm;
    // count(instances) ≡ sum(cnt)).
    val terms = tg.join(model, Seq("w1", "w2", "w3"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        floor(log(
          lit(l3) * (col("c3").cast("double") / col("c2ctx").cast("double")) +
          lit(l2) * (col("cbg").cast("double") / col("c1ctx").cast("double")) +
          lit(l1) * (col("c1").cast("double") / col("n").cast("double")) +
          lit(l0) / col("vv").cast("double")) * lit(1000000.0)).as("tm"))
    terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        (-sum(col("tm"))).as("nll_micro"))
      .withColumn("avg_nll_micro",
        floor(col("nll_micro").cast("double") /
          col("n_trigrams").cast("double")))
  }
}
