package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Round-8-continuation soak: the new operators (bigram perplexity,
  * SemDeDup clustered path, DSIR weights, exact quantiles, IVF-PQ) at
  * sf0.1 vs /tmp/sf1 (10× rows, make_sf1.py). Prints one JSON line per
  * (query, sf) with seconds and output rows — input to the NOTES ratio
  * table. SemDeDup runs the CLUSTERED path (numClusters scales with the
  * corpus — the paper's deployment shape); IVF-PQ runs realistic probes
  * (nProbe 4 of 16, 100-candidate shortlist), not the oracle's
  * exhaustive lever. */
object SoakR8C {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfs = Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> "/tmp/sf1",
      "sf10" -> "/tmp/sf10")
      .filter(s => new java.io.File(s._2).exists())
    for ((sfName, dir) <- sfs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      def run(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"soak":"$name","sf":"$sfName","sec":$sec%.3f,"rows":$rows}""")
      }
      run("p33_bigram_perplexity") {
        Lm.bigramPerplexity(docs, "doc_id", "text").count()
      }
      run("p34_semdedup_clustered") {
        // clusters scale with the corpus (~250 vectors/list)
        val k = math.max(8, (embs.count() / 250).toInt)
        Dedup.semDeDup(embs, "vec_id", "embedding", 0.35, k).count()
      }
      run("p35_dsir_weights") {
        Sampling.dsirWeights(docs, "doc_id", "text",
          col("lang") === "en", 4096).count()
      }
      run("p36_exact_quantiles") {
        Stats.exactQuantiles(docs, "n_chars", "lang",
          Seq(0.1, 0.5, 0.9, 0.99)).count()
      }
      run("p38_trigram_perplexity") {
        Lm.trigramPerplexity(docs, "doc_id", "text").count()
      }
      run("p39_clean_with_lm") {
        CorpusClean.run(docs, 0.3, Seq("de", "en", "es", "fr", "zh"))
          .join(Lm.bigramPerplexity(docs, "doc_id", "text")
            .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("avg_nll_micro")), "doc_id")
          .filter(org.apache.spark.sql.functions
            .col("avg_nll_micro") <= 3400000L).count()
      }
      run("p37_ivfpq_probed") {
        IvfPq.topK(embs, "vec_id", "embedding", Seq(0L, 1L, 2L), 5,
          numClusters = 16, nProbe = 4, m = 8, k = 16,
          candidates = 100).count()
      }
    }
    spark.stop()
  }
}
