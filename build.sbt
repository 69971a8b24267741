ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "feastspark"
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
// The driver machine-parses the LAST stdout line of `sbt "runMain
// graft.Bench"` as JSON. Two sbt behaviors broke that every round:
// the forked process's stdout was re-logged with an `[info] ` prefix,
// and sbt appended its own `[success] Total time` banner after it.
// Raw pass-through + no success banner keep the metric line last and
// prefix-free (stderr stays separate, so Spark WARN chatter cannot
// interleave into stdout).
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — lint
// can't see that
Global / excludeLintKeys += showSuccess
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
  // Pin the initial heap to the max: ParallelGC grows the heap through
  // full collections, so an unpinned 8 g heap pays several avoidable
  // stop-the-world cycles in the first bench passes (r16 A/B rows in
  // OPTIMIZATION_r16.md; ratio-to-same-run-DuckDB 1.36/0.96 pinned vs
  // 1.45/1.40 unpinned).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput GC for the forked batch JVMs (bench/verify/tests): these
  // are short-lived, allocation-heavy batch runs where ParallelGC's
  // stop-the-world young collections beat G1's concurrent machinery —
  // measured r16 on interleaved same-box bench pairs: G1 3.846/4.355/
  // 3.986 s vs ParallelGC 3.349/3.004/3.421 s total (≈15-20% on every
  // draw, every headline query moved, no outlier). The standard Spark
  // batch-throughput GC guidance; long-lived low-latency serving
  // deployments would keep G1 — override via SPARK_GRAFT_GC.
  // ADVICE r16: the flag is built by interpolation, so an off-list
  // value (e.g. "G1GC" or a full -XX flag) would produce a malformed
  // option and every forked JVM would fail at launch with an opaque
  // error — validate against the JDK's collector names and fail HERE
  // with a readable message instead.
  {
    val gc = sys.env.getOrElse("SPARK_GRAFT_GC", "Parallel")
    val allowed = Set("Parallel", "G1", "Z", "Serial", "Shenandoah")
    require(allowed.contains(gc),
      s"SPARK_GRAFT_GC must be one of ${allowed.mkString("/")} (got '$gc'): " +
        "it is interpolated into -XX:+Use<value>GC")
    s"-XX:+Use${gc}GC"
  },
)
