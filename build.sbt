ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cisbenchmarkpdfparserspark"
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
)
// local[32] = one JVM doing all executor work: give `run` a real heap
// (the machine has 128 GiB; allocation-heavy FSM stages go GC-bound at 8g).
// Xms=Xmx: without it the heap grows/uncommits across G1 cycles and the VM
// burns >90% SYSTEM time in page faults (measured via vmstat in this sandbox).
// NO AlwaysPreTouch: on this kernel pre-zeroing 24 GB costs ~4 min of wall
// (79 min of SYS time, measured) before main() even starts — it silently
// blew the driver's verify/bench time budgets in round 2. Xms=Xmx alone
// stops the grow/uncommit churn; first-touch faults happen once per page,
// amortized into the run.
// 12g default: this kernel zeroes anonymous pages at ~100 MB/s, so every
// gigabyte of heap the JVM touches costs ~10 s of one-time wall somewhere
// in the run — a 24g heap G1 eventually laps through taxed the sweep ~4 min.
// 12g is ample for every query at the driver's SF and halves that bound.
run / javaOptions ++= {
  val m = sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")
  Seq(s"-Xmx$m", s"-Xms$m")
}
Test / javaOptions ++= Seq("-Xmx8g", "-Xms8g")
