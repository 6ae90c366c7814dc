package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("codegen'd dot/cosine expressions match the reference computation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5, 2.5), Array(-2.0, 0.25, 8.0))
    ).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("d"),
      GraftFunctions.cosine(col("a"), col("b")).as("c")).collect()
    def refDot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    def refCos(x: Array[Double], y: Array[Double]) =
      refDot(x, y) / (math.sqrt(refDot(x, x)) * math.sqrt(refDot(y, y)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(0).getDouble(1) == refCos(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
    assert(rows(1).getDouble(0) == refDot(Array(0.5, -1.5, 2.5), Array(-2.0, 0.25, 8.0)))

    // float arrays implicitly cast to double (the embeddings table case)
    val f = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(f.select(GraftFunctions.dot(col("a"), col("b"))).head().getDouble(0) == 11.0)

    // null-safe: null array yields null
    val n = df.select(GraftFunctions.dot(lit(null).cast("array<double>"), col("b")))
    assert(n.head().isNullAt(0))
  }

  test("the expression stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // a real scan (local rows constant-fold into a LocalTableScan)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = e.select(
      GraftFunctions.cosine(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val ep = df.queryExecution.executedPlan.toString
    assert(ep.contains("*(")) // whole-stage codegen span
    assert(!ep.contains("BatchEvalPython") && !ep.toLowerCase.contains("scalaudf"))
  }
}
