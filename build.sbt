ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "syntheticdata_pipelinespark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Throughput collector: measurably less jitter than G1 for this
  // many-small-tasks local[32] profile (bench A/B: ~40 s vs ~45 s).
  "-XX:+UseParallelGC",
)

// Optional Selenium adapter source set (SCALE.md "JS-rendered ingestion
// needs a browser"): graft.stages.SeleniumRenderer compiles ONLY when a
// deployment opts in with -Dgraft.selenium=true AND supplies selenium-java
// jars via -Dgraft.selenium.jars=<dir>. The zero-egress build can't
// resolve Selenium, so the default build skips the directory entirely;
// deployments that ship it get a compile-checked adapter, not a snippet.
Compile / unmanagedSourceDirectories ++= {
  if (sys.props.get("graft.selenium").exists(_.equalsIgnoreCase("true")))
    Seq(baseDirectory.value / "src" / "optional" / "selenium" / "scala")
  else Seq.empty
}
Compile / unmanagedJars ++= sys.props.get("graft.selenium.jars")
  .map(d => (file(d) ** "*.jar").classpath.toSeq).getOrElse(Seq.empty)
