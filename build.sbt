ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlloadingscriptsspark"
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
// Bench's driver contract wants its compact JSON record to be the LAST
// stdout line of the sbt invocation, but the forked bench JVM exits
// before sbt prints its "[success] Total time…" epilogue. Bench hands
// the line over via target/bench_last_line.json; this JVM shutdown
// hook (registered in the SBT process at project load) prints it raw
// as sbt itself exits — after the epilogue — then deletes the file so
// unrelated sbt invocations never replay a stale record.
// (sbt evaluates .sbt expressions more than once, so several hooks can
// register and they all run CONCURRENTLY at shutdown — the atomic
// rename makes exactly one of them win and print.)
val benchLastLineEcho: Thread = {
  val t = new Thread(() => {
    val f = new java.io.File("target/bench_last_line.json")
    val claimed = new java.io.File(
      s"target/bench_last_line.${Thread.currentThread.getId}.claimed")
    if (f.exists && f.renameTo(claimed)) {
      val src = scala.io.Source.fromFile(claimed, "UTF-8")
      val line = try src.mkString.trim finally src.close()
      claimed.delete()
      if (line.nonEmpty) println(line)
    }
  })
  java.lang.Runtime.getRuntime.addShutdownHook(t)
  t
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage codegen across ~50 distinct queries overflows the default
  // 240m JIT code cache; once full, HotSpot disables compilation and every
  // later query runs interpreted (~10x slower single-task stages).
  "-XX:ReservedCodeCacheSize=1g",
  // Keep Derby's error log out of the repo root. Set here (not in a spec
  // class body) so it is guaranteed to precede embedded-driver load no
  // matter which suite touches Derby first.
  "-Dderby.stream.error.file=target/derby.log",
)
