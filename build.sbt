ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "epicpandasspark"
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
)

// Parallel forked test groups: PlanSpec alone runs ~2m45 and the suite
// sum is ~7m45 sequential — one JVM per group, groups in parallel,
// brings the default `sbt test` under the 5-minute CI budget while
// still running EVERY test (no tag-and-skip second profile). Grouping
// is safe: suites share nothing across JVMs (conf mutations are
// session-local, catalog table names are suite-local, temp dirs are
// per-test), and each group's suites still run sequentially on its own
// SharedSpark session exactly as before.
def testGroupOf(name: String): Int = name match {
  case "graft.PlanSpec" | "graft.ChecksSpec" | "graft.SamplingSpec" => 0
  case "graft.DedupAnnSpec" | "graft.LongTailSpec" | "graft.ScaleSpec" |
       "graft.JoinsSpec" => 1
  case "graft.StreamingSpec" | "graft.WindowsSpec" |
       "graft.ExtensionsSpec" => 2
  case "graft.RetrievalSpec" | "graft.CorpusSpec" | "graft.SourcesSpec" |
       "graft.EventsSpec" => 3
  case _ => 4
}
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.groupBy(t => testGroupOf(t.name)).toSeq
    .sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"group-$g", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// Concurrent forked groups each inherit the full -Xmx; cap the
// parallelism by what the host can actually hold (5 x 8g = 40 GB peak
// would thrash an 8-16 GB host that ran the old single-JVM suite).
// SPARK_GRAFT_TEST_FORKS overrides the derived value.
val testForkLimit: Int = sys.env.get("SPARK_GRAFT_TEST_FORKS")
  .flatMap(s => scala.util.Try(s.trim.toInt).toOption) getOrElse {
    val heapGb = {
      val m = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
      scala.util.Try {
        if (m.endsWith("g")) m.dropRight(1).toDouble
        else if (m.endsWith("m")) m.dropRight(1).toDouble / 1024.0
        else m.toDouble / (1L << 30)
      }.getOrElse(8.0)
    }
    val hostGb = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getTotalMemorySize.toDouble / (1L << 30)
      case _ => 16.0
    }
    math.max(1, math.min(5, (hostGb * 0.8 / heapGb).toInt))
  }
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkLimit),
  Tags.limitAll(16),
)
