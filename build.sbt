ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "splinkspark"
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
// Pass the forked JVM's stdout/stderr straight through instead of routing
// them through sbt's logger (which prefixes every line with [info] and
// breaks line-oriented JSON consumers of `sbt runMain graft.Bench`).
run / outputStrategy := Some(StdoutOutput)
// Drop sbt's trailing "[success] Total time: …" line so the bench JSON
// printed by graft.Bench stays the LAST line of `sbt runMain` stdout —
// the driver parses that tail line.
Global / showSuccess := false
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
  // 20g default: local[32] runs 32 concurrent tasks in ONE JVM (each with
  // sort/join execution buffers) plus the block-manager cache — 8g OOMed
  // the sf10 bench section; the box has 128 GiB. Override with
  // SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // ParallelGC, not the JDK-17 default G1: a 230+-query batch suite in one
  // long-lived JVM ages the heap (Tungsten page allocations are humongous
  // by G1 region standards), and G1's concurrent cycles in the aged heap
  // made the LATE bench sections run 2.5x slower with byte-identical
  // task/shuffle stats (sf10 CC: 108s in-suite vs 43s in a fresh JVM;
  // under ParallelGC the same in-suite query is 38s). Stop-the-world
  // throughput collection is the right trade for a headless batch
  // engine — same reasoning applies to executor JVMs on a real cluster.
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+"))
