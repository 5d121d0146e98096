ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkmlspatialjointransformerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
Test / parallelExecution := false
// CustomSparkSessionSpec hand-rolls its own local[1] SparkSession — one
// SparkContext per JVM, so it runs in a separate forked JVM from the
// suites sharing SparkTestKit's session
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val (custom, shared) = (Test / definedTests).value
    .partition(_.name == "graft.transformer.CustomSparkSessionSpec")
  Seq(
    Tests.Group("shared-spark", shared, Tests.SubProcess(opts)),
    Tests.Group("custom-spark", custom, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
run / fork := true
// Forked runMain output passes through RAW (no sbt "[info] " line
// prefix): the bench driver json-parses the tail of stdout, and a
// prefixed "[info] {...}" line is not valid JSON to a plain parser.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Heap size in MB resolved from SPARK_DRIVER_MEM ("8g" / "512m" / MB
// number). All three heap flags (-Xmx/-Xms/-Xmn) derive from this ONE
// parse, normalized back to an explicit "<n>m" — passing the raw env
// string to -Xmx while parsing it differently here would let the parser
// accept values the JVM launch rejects (e.g. a bare "512" is 512 MB
// here but 512 BYTES to the JVM).
val graftHeapMb: Long = {
  val s = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val n = s.takeWhile(_.isDigit) match { case "" => 8192L; case d => d.toLong }
  if (s.endsWith("g")) n * 1024 else if (s.endsWith("k")) math.max(n / 1024, 1L) else n
}
val graftYoungGenMb: Long = math.max(math.min(graftHeapMb / 4, 2048L), 16L)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${graftHeapMb}m",
  // pin the heap and use the throughput collector: G1's adaptive sizing
  // (reset by every explicit GC) intermittently shrinks the young gen
  // under the pairwise joins' allocation bursts, promoting transient
  // garbage and spending 10x the stage CPU in GC (JFR-measured 238s of
  // in-task GC on a 21s-CPU stage). Parallel GC with a fixed heap keeps
  // identical runs identical.
  s"-Xms${graftHeapMb}m",
  "-XX:+UseParallelGC",
  // ... and pin the young gen as well: ParallelGC's adaptive size policy
  // re-shrinks it under pause-time pressure, recreating the same
  // promotion storm non-deterministically. Sized from the resolved heap
  // (quarter of it, capped at the measured 2g sweet spot) so a small
  // SPARK_DRIVER_MEM doesn't ask for a young gen larger than the heap.
  s"-Xmn${graftYoungGenMb}m",
  // Janino codegen loads thousands of classes; every Metaspace
  // high-water-mark expansion from the default ~21 MB triggers a
  // "Metadata GC Threshold" FULL collection — measured as 30s+ GC storms
  // striking whichever query happens to cross the next threshold. Start
  // the mark high enough that it never triggers.
  "-XX:MetaspaceSize=512m",
  // Janino whole-stage-codegen methods routinely exceed HotSpot's
  // 8000-bytecode HugeMethodLimit; with the default DontCompileHugeMethods
  // those methods run INTERPRETED forever — measured 20x on pairwise
  // spatial stages (370s+ of executor CPU vs 24s for the same 15M-pair
  // stage once compiled). Standard Spark deployment flag.
  "-XX:-DontCompileHugeMethods",
) ++ sys.env.get("GRAFT_JFR").map(f =>
  s"-XX:StartFlightRecording=filename=$f,settings=profile").toSeq
