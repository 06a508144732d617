ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "evaporatespark"
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
// Forked run output goes straight to this process's stdout/stderr —
// no "[info] " logger prefix, so graft.Bench's single JSON line is
// machine-parseable by whatever captures the process output.
run / outputStrategy := Some(StdoutOutput)
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
// Parallel forked test groups: the suite previously ran every Spark
// suite sequentially in ONE forked JVM over a shared local[4] session
// — 4 of 32 cores busy for ~20 min (and past the judging driver's
// window on a contended box). Suites are weight-bin-packed into
// GRAFT_TEST_GROUPS forked JVMs (each with its own local[4] session;
// suites use createTempDirectory, no shared warehouse/metastore, so
// concurrent JVMs do not collide). Weights are measured idle-box
// seconds from the r18 sequential baseline; unknown suites default to
// 5 s. GRAFT_TEST_GROUPS=1 restores the serial order exactly.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val n = math.max(1, sys.env.getOrElse("GRAFT_TEST_GROUPS", "8").toInt)
  // Each forked JVM must believe it owns only its SLICE of the box:
  // without ActiveProcessorCount every JVM sizes GC/JIT/netty pools
  // for all 32 cores, and n concurrent JVMs thrash each other into
  // the ground (first grouped run: LabelModelSpec 56 s → 1584 s, the
  // whole suite SLOWER than sequential). 32/n + 1 leaves the local[4]
  // session its task slots plus one for the driver side.
  val procs = math.max(2, 32 / n + 1)
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector ++
      (if (n > 1) Vector(s"-XX:ActiveProcessorCount=$procs") else Vector.empty))
    .withWorkingDirectory((Test / baseDirectory).value)
  if (n == 1 || tests.size <= 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(forkOpts)))
  else {
    val weight = Map(
      "graft.api.ProfilerSpec"               -> 540,
      "graft.EntrySpec"                      -> 460,
      "graft.streaming.StreamingExtractSpec" -> 210,
      "graft.relops.HypothesisTestsSpec"     -> 165,
      "graft.textops.TextOpsSpec"            -> 150,
      "graft.DeterminismSpec"                -> 85,
      "graft.textops.BpeSpec"                -> 62,
      "graft.combine.LabelModelSpec"         -> 56,
      "graft.relops.Round17GraphSpec"        -> 56,
      "graft.api.EvaluateEndToEndSpec"       -> 50,
      "graft.relops.KCoreHitsSpec"           -> 49,
      "graft.lake.LakeOpsSpec"               -> 37,
      "graft.textops.SemDedupSpec"           -> 26,
      "graft.textops.WordTableBoundsSpec"    -> 24,
      "graft.relops.TriangleSampledSpec"     -> 24,
      "graft.textops.CurationSpec"           -> 23,
      "graft.score.ScoreSpec"                -> 20,
      "graft.textops.BucketCapSpec"          -> 15,
      "graft.extract.TokenCostSpec"          -> 14,
      "graft.relops.ParetoMixEceSpec"        -> 14,
      "graft.schema.SchemaIdSpec"            -> 11,
      "graft.extract.ExtractorsSpec"         -> 9,
    )
    val bins = Vector.fill(n)(scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
    val load = scala.collection.mutable.ArrayBuffer.fill(n)(0L)
    // greedy longest-first into the lightest bin — classic LPT packing
    tests.sortBy(t => -weight.getOrElse(t.name, 5)).foreach { t =>
      val i = load.zipWithIndex.minBy(_._1)._2
      bins(i) += t
      load(i) += weight.getOrElse(t.name, 5).toLong
    }
    bins.zipWithIndex.collect {
      case (b, i) if b.nonEmpty =>
        Tests.Group(s"group-$i", b.toSeq, Tests.SubProcess(forkOpts))
    }
  }
}
// sbt caps concurrent forked test groups at 1 by default — lift it so
// the groups actually overlap (and keep an overall task ceiling)
Global / concurrentRestrictions := {
  val n = math.max(1, sys.env.getOrElse("GRAFT_TEST_GROUPS", "8").toInt)
  Seq(Tags.limit(Tags.ForkedTestGroup, n), Tags.limitAll(n + 4))
}
