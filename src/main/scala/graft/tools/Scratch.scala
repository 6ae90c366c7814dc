package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch driver used by /verify sessions to exercise the library through
  * its public API from a real Spark driver (not a test). Current probe:
  * embeddingNearDups fixed-plane vs auto-scaled planes at a big SF —
  * the documented scale lever for the within-bucket quadratic.
  *
  *   runMain graft.tools.Scratch <sfDir>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val vecs = graft.QueryLib.tbl(spark, dir, "embeddings")
    val n = vecs.count()
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"""{"probe":"$name","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.1f,"rows":$rows}""")
    }
    timed("embed_auto_planes") {
      graft.pipeline.Dedup.embeddingNearDupsAuto(
        vecs, "vec_id", "embedding", 0.3, dim = 64).count()
    }
    timed("embed_fixed_4_planes") {
      graft.pipeline.Dedup.embeddingNearDups(
        vecs, "vec_id", "embedding", 0.3,
        graft.pipeline.Similarity.randomPlanes(4, 64)).count()
    }
    spark.stop()
  }
}
