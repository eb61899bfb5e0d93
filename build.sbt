ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wikimysqlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Driver bench contract (VERDICT r15 #6): the driver records a stdout
// tail and json-parses the LAST line; BENCH_r*.json has shipped
// "parsed": null since r2 because sbt wrapped the gate JSON in an
// "[info] " prefix and followed it with the "[success] Total time"
// epilogue. Forked runs inherit stdout directly (no prefix), and the
// epilogue is suppressed, so graft.Bench's final gate line IS the last
// stdout line, bare.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// suites share one SparkSession (and two specs swap the default
// session); run them sequentially in the forked JVM
Test / parallelExecution := false
run / fork := true
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// JVM pinning (BASELINE.md "r14 era experiment"): fixed heap, pre-touched
// pages, explicit G1 — removes heap-resize / first-touch page-fault /
// GC-selection variance as candidate causes of the box's 1.17-1.64x
// same-code bench "eras". SPARK_GRAFT_PIN_JVM=0 opts out (the A side of
// the A/B; also the escape hatch on a memory-tight box, since Xms=Xmx
// commits the full heap at launch).
javaOptions ++= (
  if (sys.env.get("SPARK_GRAFT_PIN_JVM").contains("0")) Seq.empty[String]
  else Seq(
    s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
    "-XX:+AlwaysPreTouch",
    "-XX:+UseG1GC"))
