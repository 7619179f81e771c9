ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gpsstreamprocessingspark"
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
// Forked run output passes straight to stdout (no "[info] " logger
// prefix) so harnesses can parse Bench's one-line metric JSON.
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
  // 24g on a 125 GiB box: the old 8g default left ~4.6 GiB of unified
  // memory for a 226-query local[32] sweep whose session-keyed caches +
  // localCheckpoints overflow it — evicted blocks then re-read from the
  // contended /tmp disk store (22 MB/s under neighbor load), the r19
  // search-family bench regression's mechanism. Override with
  // SPARK_DRIVER_MEM as before.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ {
  // Block-manager scratch (shuffle files, disk-store evictions) belongs
  // on the engine's local-scratch tier, not the shared /tmp disk — the
  // same rationale as engine.Core.scratchRoot (which gates on ≥ 2 GiB
  // tmpfs headroom; mirrored here because spark.local.dir must be set
  // before the forked JVM's SparkContext starts). SPARK_GRAFT_SCRATCH
  // overrides, matching Core.
  val dir = sys.env.get("SPARK_GRAFT_SCRATCH").orElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= (2L << 30))
      Some("/dev/shm/graft")
    else None
  }
  dir.toSeq.map { d =>
    val local = new java.io.File(d, "sparklocal")
    local.mkdirs()
    s"-Dspark.local.dir=${local.getPath}"
  }
}
