ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prestoweatherspark"
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
  // local[32] runs 32 concurrent tasks + cached relations in ONE JVM;
  // 8g starved that (GC pressure dominated cold bench runs on a
  // 128 GiB machine). Sized so execution+storage memory per task is
  // executor-realistic.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 97-query session generates a unique whole-stage-codegen class set
  // per query; the default 240 MB code cache fills mid-run, the JIT
  // stops compiling (or flush-churns), and later CPU-heavy stages run
  // INTERPRETED at 4-5x cost. Measured: identical stages on identical
  // data burned 31 s vs 166 s of pure CPU (no GC, no spill) depending
  // on compile state — the round-3/4 bimodal dedup-family timings.
  // A real cluster sizes this the same way (executor JVMs serving many
  // query shapes); 1g removes the ceiling at ~0.4% of machine RAM.
  "-XX:ReservedCodeCacheSize=1g",
  // Second JIT mechanism, measured after the cache fix: a freshly
  // codegen'd heavy stage can run INTERPRETED for its whole lifetime if
  // the compile queue drains late — the same stage on the same data
  // burned 516 s vs 20 s of CPU depending on whether C1/C2 output
  // landed before or during execution (a per-run coin flip). Reaching
  // compile thresholds sooner shrinks that window; plenty of cores are
  // available for compiler threads in local[32], and more of them
  // drain the post-codegen compile burst before the stage ends
  // (A/B'd: dedup_near_prefix in-bench 14-25 s -> 7-11 s at equal
  // host load).
  "-XX:CompileThresholdScaling=0.25",
  "-XX:CICompilerCount=18",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+"))
