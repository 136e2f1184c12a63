ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "named_entity_recognitionspark"
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
// Heap default: size the single local-mode JVM to the machine, not to a
// constant (optimization guide §5/§9). In local[N] the driver JVM IS the
// executor: all N concurrent tasks share ONE heap, so the ceiling that
// matters is heap-per-core. The old 8g default gave 32 cores 256 MB each
// — far below the ~1 GB/core Spark executors are normally sized to — and
// the allocation-heavy operators (explode/string/JSON paths) spent the
// bench in GC: measured same-box A/B at round 8 start, 238 s full
// surface at 8g vs 197 s at 64g with NO code change (q104 14.6 → 2.6 s,
// q30 5.9 → 0.8 s, q02 2.0 → 1.4 s; BENCH/bench_r8_baseline_8g.json vs
// the post-change runs in OPTIMIZATION_r08.md). 64g ≈ 2 GB/core at
// local[32], the standard production executor sizing; spark-submit runs
// were already at --driver-memory 100g (scripts/repro.sh), so sbt-forked
// runs now match the environment the per-query records were taken in.
// Still parameterised: SPARK_DRIVER_MEM overrides (e.g. a smaller box).
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
) ++ sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(' ').filter(_.nonEmpty))
