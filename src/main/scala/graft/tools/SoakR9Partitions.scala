package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Round-9 soak: prove (or refute) the r8 attribution that p33/p38/p39's
  * superlinear sf1→sf10 ratios (×13.9-14.7 at fixed 32 shuffle
  * partitions) come from per-task memory pressure, by running the same
  * three pipelines under BOTH partition configurations in one window:
  *
  *  - fixed32: the bench default (32 partitions at every SF)
  *  - scaled: partitions grow with the input (∝ rows/1500, min 32) the
  *    way a real cluster sizes them — per-task state stays constant, so
  *    hash aggregates/joins stop spilling as the input decade grows
  *
  * Prints one JSON line per (config, query, sf). The NOTES table reads
  * sec(sf10)/sec(sf1) per config; attribution holds if the scaled
  * config lands ≤ ×12 where fixed32 is ×13.9-14.7.
  */
object SoakR9Partitions {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfs = Seq("sf1" -> "/tmp/sf1", "sf10" -> "/tmp/sf10")
      .filter(s => new java.io.File(s._2).exists())
    for ((cfg, partsOf) <- Seq(
        "fixed32" -> ((_: Long) => 32),
        "scaled" -> ((rows: Long) => math.max(32, (rows / 1500).toInt)));
        (sfName, dir) <- sfs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nRows = docs.count()
      val parts = partsOf(nRows)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      def run(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"soak":"$name","cfg":"$cfg","partitions":$parts,"sf":"$sfName","sec":$sec%.3f,"rows":$rows}""")
      }
      run("p33_bigram_perplexity") {
        Lm.bigramPerplexity(docs, "doc_id", "text").count()
      }
      run("p38_trigram_perplexity") {
        Lm.trigramPerplexity(docs, "doc_id", "text").count()
      }
      run("p39_clean_with_lm") {
        CorpusClean.run(docs, 0.3, Seq("de", "en", "es", "fr", "zh"))
          .join(Lm.bigramPerplexity(docs, "doc_id", "text")
            .select(col("doc_id"), col("avg_nll_micro")), "doc_id")
          .filter(col("avg_nll_micro") <= 3400000L).count()
      }
    }
    spark.stop()
  }
}
