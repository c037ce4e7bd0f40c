ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "yetanothermapreducespark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The bench/test sweep runs ~200 distinct queries in ONE JVM, each
  // with freshly generated (whole-stage-codegen) classes, while 32
  // executor threads saturate every core — the default JIT compiler
  // thread count starves behind that load and codegen'd regex/json/math
  // chains run interpreted for most of a short query's life (measured:
  // dedup_url 13.8 s -> 2.0 s at sf1 with this flag, same build, same
  // sweep). Long-lived production executors compile a handful of hot
  // queries once; the flag restores that steady-state fidelity here.
  "-XX:CICompilerCount=16",
) ++
  // dial/probe passthrough for bench runs, e.g.
  // SPARK_GRAFT_EXTRA_OPTS="-Dspark.graft.simhash.maxDist=4" —
  // SparkSession absorbs spark.* system properties into its conf.
  // Whitespace-split: a conf VALUE containing a space cannot be passed
  // through this hook (it would arrive as two malformed options) — every
  // graft dial is numeric/boolean, so the limitation is deliberate
  // filter(_.nonEmpty): an empty or space-padded value would otherwise
  // emit an empty-string java option, which the launcher reads as the
  // main class — aborting every forked run
  sys.env.get("SPARK_GRAFT_EXTRA_OPTS").toSeq
    .flatMap(_.split("\\s+")).filter(_.nonEmpty)
