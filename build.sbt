ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daskgeomodelingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// BigTiffSoakSpec holds two ~4.3 GB pixel arrays across its write→read
// property; run alongside the parallel Spark suites in one JVM, the GC
// pressure stalls Spark's RPC heartbeats and the fork dies after the tests
// pass. Give it its own forked JVM and run the groups one at a time.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val (soak, main) = (Test / definedTests).value.partition(_.name.contains("BigTiffSoak"))
  Seq(
    Tests.Group("main", main, Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))),
    Tests.Group("bigtiff-soak", soak, Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))),
  ).filter(_.tests.nonEmpty)
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 14g: the BigTIFF >4GiB round-trip test holds one 4.3 GB pixel array
  // on each side of the write→read property (plus the Spark session)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "14g")}",
)
