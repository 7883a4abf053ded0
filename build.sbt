ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "odibispark"
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
// Pass the forked program's stdout through UNPREFIXED. sbt's default
// LoggedOutput decorates every forked-stdout line with "[info] ", which
// corrupts the one-line JSON contract of `runMain graft.Bench` (a parser
// doing json.loads per line never matches "[info] {...}").
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
)

// ---- parallel test execution ----------------------------------------
// The suite runs ~47 min sequentially in ONE forked JVM (one local[4]
// SparkContext); on a 32-core box that leaves 28 cores idle and blows
// any CI time budget. Split the suites into independently forked JVMs
// (each with its own SparkContext) and run the groups concurrently:
// the three giants get dedicated groups — the CPU-bound soaks with a
// wider session (-Dgraft.test.cores, read by SparkSpec) — and the rest
// are greedily bin-packed by measured duration. Suite RESULTS are
// core-count independent (plan-shape audits key off
// spark.sql.shuffle.partitions=4, which is unchanged); suites never
// shared JVM state beyond the SparkSpec session, which is per-JVM.
// Escape hatch: SPARK_GRAFT_TEST_GROUPS=1 restores the serial layout.
val testGroupCount = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "8").toInt
// measured per-suite seconds (full green run, 2026-08-18); unlisted
// suites default to 5 s — they are all <10 s
val suiteSeconds: Map[String, Int] = Map(
  "graft.SoakSpec" -> 1133, "graft.TrainingSoakSpec" -> 609,
  "graft.CommitStoreSpec" -> 304, "graft.DeltaMergeSpec" -> 54,
  "graft.RecallSpec" -> 43, "graft.ExamplesSpec" -> 34,
  "graft.DeltaStreamSourceSpec" -> 34, "graft.IcebergMaintenanceSpec" -> 31,
  "graft.YamlStreamingSpec" -> 31, "graft.SubsystemsSpec" -> 29,
  "graft.IcebergStreamSourceSpec" -> 28, "graft.DeltaMaintenanceSpec" -> 25,
  "graft.CatalogSpec" -> 23, "graft.IcebergConcurrencySpec" -> 22,
  "graft.IcebergDeleteSpec" -> 22, "graft.DeltaDvSpec" -> 20,
  "graft.ToolsSpec" -> 15, "graft.DeltaLogSpec" -> 15,
  "graft.QualityClassifierSpec" -> 14, "graft.FuzzySpec" -> 14,
  "graft.PackingSpec" -> 13, "graft.DeltaSchemaSpec" -> 13,
  "graft.ComponentsSpec" -> 13, "graft.LifecycleE2ESpec" -> 12,
  "graft.IcebergTransformSpec" -> 12, "graft.OperatorsSpec" -> 12,
  "graft.FormatsSpec" -> 12, "graft.DeltaWriterSpec" -> 11,
  "graft.PropertySpec" -> 11, "graft.YamlPatternsSpec" -> 10,
  "graft.DerivedUpdaterSpec" -> 10, "graft.TemplatesSystemSpec" -> 10)
// dedicated groups: suite name -> session cores for that JVM
val dedicatedSuites: Map[String, Int] = Map(
  "graft.SoakSpec" -> 14,          // 20M-row CPU-bound soaks
  "graft.TrainingSoakSpec" -> 10,  // 2M-row pipeline soaks
  "graft.CommitStoreSpec" -> 4)    // lock-contention tests: sleep-bound
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  def group(name: String, ts: Seq[TestDefinition], cores: Int) =
    Tests.Group(name, ts, Tests.SubProcess(ForkOptions().withRunJVMOptions(
      baseOpts :+ s"-Dgraft.test.cores=$cores")))
  if (testGroupCount <= 1) Seq(group("all", tests, 4))
  else {
    val (heavy, rest) = tests.partition(t => dedicatedSuites.contains(t.name))
    val generalBins = math.max(1, testGroupCount - heavy.size)
    // greedy LPT: heaviest first into the currently lightest bin
    val bins = Array.fill(generalBins)(
      (scala.collection.mutable.ArrayBuffer.empty[TestDefinition], Array(0)))
    rest.sortBy(t => -suiteSeconds.getOrElse(t.name, 5)).foreach { t =>
      val (buf, w) = bins.minBy(_._2(0))
      buf += t; w(0) += suiteSeconds.getOrElse(t.name, 5)
    }
    heavy.map(t => group(t.name, Seq(t), dedicatedSuites(t.name))) ++
      bins.zipWithIndex.collect { case ((buf, _), i) if buf.nonEmpty =>
        group(s"g$i", buf.toSeq, 4) }
  }
}
// sbt caps concurrent forked test groups at 1 by default — raise it
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(testGroupCount + 2,
    java.lang.Runtime.getRuntime.availableProcessors)))
