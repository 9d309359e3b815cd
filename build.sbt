ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "metadata_extractors_apispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Compile / scalacOptions ++= Seq("-deprecation", "-unchecked")
Test / fork := true
run / fork := true
// Pass the forked run's stdout straight through instead of relaying it
// via sbt's logger: the bench/verify harness greps for a raw JSON line,
// and the logger's "[info] " prefix made every line non-JSON.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// `sbt test` wall time is bounded by the SUM of 22 suites when they all
// share one forked JVM (30+ min — the r15 driver's test budget timed out
// mid-run, VERDICT r15 item 2b). The suites are independent (each JVM
// builds its own SharedSpark session; all corpus/layout state lives in
// per-test temp dirs; /root/testdata is read-only), so split them into
// four time-balanced forked groups and run the groups concurrently:
// wall time becomes the slowest GROUP (~8 min). Group weights are the
// measured per-suite seconds from target/test-reports at r16 start:
//   Crash 405 | Merge 198 | PlanLint 165 | Entry 144 | OracleLint 141
//   Partitioned 104 | SigStore 95 | VectorIdx 77 | Streaming 73
//   Lifecycle 69 | Property 68 | SqlDml 68 | IncDedup 55 | StatsMan 44
//   AsOf 22 | CorpusLayout 21 | CorpusLaws 18 | RegistrySeam 17
//   Engine 17 | ZOrder 8 | CallPlanParse 4 | BinJoin 1
// A suite not named below lands in a group by name-hash — balance it by
// hand once it shows up in the report timings.
val testGroupOf: Map[String, Int] = Map(
  "graft.CrashRecoverySpec" -> 0, "graft.StatsManifestSpec" -> 0,
  "graft.CallPlanParseSpec" -> 0,
  "graft.MergeSpec" -> 1, "graft.SignatureStoreSpec" -> 1,
  "graft.LifecycleSpec" -> 1, "graft.IncrementalDedupSpec" -> 1,
  "graft.CorpusLayoutSpec" -> 1, "graft.EngineSpec" -> 1,
  "graft.PlanLintSpec" -> 2, "graft.PartitionedLayoutSpec" -> 2,
  "graft.VectorIndexStoreSpec" -> 2, "graft.PropertySpec" -> 2,
  "graft.CorpusLawsSpec" -> 2, "graft.ZOrderSpec" -> 2,
  "graft.BinJoinRuleSpec" -> 2, "graft.RegistrySeamSpec" -> 2,
  "graft.EntrySpec" -> 3, "graft.OracleLintSpec" -> 3,
  "graft.StreamingSpec" -> 3, "graft.SqlDmlSpec" -> 3,
  "graft.AsOfJoinSpec" -> 3,
)
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value
    .groupBy(t => testGroupOf.getOrElse(t.name, math.abs(t.name.hashCode) % 4))
    .toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"g$g", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// let all four forked groups actually run at once (sbt's default caps
// forked test groups at 1); everything else keeps the CPU-count cap
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())),
)
