ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducegospark"
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
// Forked run output must reach stdout RAW (no sbt "[info] " prefix):
// the driver parses Bench's single JSON line from stdout, and round 1's
// BENCH_r01.json recorded parsed:null because every line was decorated.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Forked-JVM heap (driver+executors in local mode). Default raised
  // 8g -> 32g on a full-registry A/B pair at sf0.1 (same binary, same
  // box, per-query gc_ms diagnostics): 334.9 s -> 297.2 s total,
  // GC sum 13.1 s -> 6.7 s, median per-query ratio 0.854, improvement
  // broad rather than outlier-driven — the allocation-heavy joins
  // (join_similarity, item_cf, the dedup_keep family) were GC-bound at
  // 8g. The sandbox has 128 GiB; on a cluster the equivalent knob is
  // properly-sized executor heaps, and SPARK_DRIVER_MEM still
  // overrides (OPTIMIZATION_r14.md session 2 has the full pair).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
