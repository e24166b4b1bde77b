ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "postgres_debezium_clickhousespark"
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
// Default driver heap: the 480-query bench/verify suite accumulates
// cached warm() artifacts, localCheckpoint blocks, and codegen classes
// in one JVM; at 8g the back half of the run is GC-bound (measured
// rested REPS=2 sf0.1 totals: 8g 187.5s -> 16g 166.8s -> 32g 145.6s,
// with late-suite queries inflated 2-4x at 8g vs isolated). But a fixed
// 32g on a small dev/CI box would swap or invoke the OOM killer — worse
// than GC pressure — so the default is clamped to half of detected
// physical RAM, capped at 32g. OVERRIDE with SPARK_DRIVER_MEM=<n>g
// (always wins, no clamp).
val driverHeap: String = sys.env.get("SPARK_DRIVER_MEM").getOrElse {
  // portable physical-RAM probe: the JMX OperatingSystemMXBean works on
  // Linux/macOS/Windows alike (reflection because getTotalMemorySize is
  // on the com.sun.management subtype). If even that fails, default to
  // a CONSERVATIVE 8g — a too-small heap is GC pressure, a too-big one
  // is swap/OOM-killer territory, which is strictly worse.
  val physGb: Long =
    try {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val m = os.getClass.getMethod("getTotalMemorySize")
      m.setAccessible(true)
      m.invoke(os).asInstanceOf[java.lang.Long].longValue() / (1L << 30)
    } catch {
      case _: Throwable =>
        try {
          scala.io.Source.fromFile("/proc/meminfo").getLines()
            .collectFirst { case l if l.startsWith("MemTotal:") =>
              l.split("\\s+")(1).toLong / (1024L * 1024L) }
            .getOrElse(16L)
        } catch { case _: Throwable => 16L } // unknown box: clamp to 8g
    }
  s"${math.max(2L, math.min(32L, physGb / 2))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
)
