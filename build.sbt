ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sodasparkspark"
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
  // 32-thread local runs push 10^8-row joins through one heap; 8g GC-thrashes
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // floor the committed heap: G1 shrinks to ~1.4g after every full GC and
  // allocation-heavy passes then re-commit gigabytes of pages mid-query —
  // measured as multi-second spikes on the wide scan (PLANS.md round-8
  // variance audit); a pinned floor removes the commit churn
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM_MIN", "8g")}",
  // A 365-query bench × several generated classes each × 3 reps overflows
  // the default 240 MB code cache, triggering flush/deopt storms late in
  // the run (measured: the q_scan_* block ran 2-3× slower in the full
  // sweep than isolated). Standard production JVM sizing for Spark
  // drivers/executors; scale-independent. (-XX:-DontCompileHugeMethods was
  // tried and REJECTED: C2 grinds for tens of seconds on the giant
  // generated methods — the fix for those is Spark-side, see
  // spark.sql.codegen.hugeMethodLimit in Bench/Verify.)
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
