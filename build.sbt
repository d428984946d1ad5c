ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mirabellespark"
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
// Forked `run` must inherit stdout: the bench/verify contract is ONE clean
// JSON line on stdout, and sbt's default LoggedOutput would prefix it with
// "[info] ", breaking the driver's parser.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Bench/Verify JVMs hold thousands of generated classes (39 queries ×
  // 9 passes); the 240 MB default forces code-cache flushing -> C2
  // recompile storms measured as multi-second random query spikes.
  // 512m was sized for 35 headline queries; widened with the set.
  "-XX:ReservedCodeCacheSize=1g",
  // generated aggregate/projection methods routinely exceed HotSpot's
  // 8 KB bytecode JIT cutoff; interpreting them is a 5-20× hot-path tax
  "-XX:-DontCompileHugeMethods",
)
