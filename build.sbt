ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "maillog2dbspark"
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
// Run the test suites in CONCURRENT forked groups (round 19: the
// serial 654-test suite outgrew the driver's test window — VERDICT
// r18 #2 — and every suite but the streaming ones idles most of a
// 32-core box on a 4-core local session). Suites are round-robined
// over the groups by sorted name; each group's JVM gets its OWN
// warehouse + derby home so catalogs, FreezeStore leases and derby
// logs never cross groups (suites were already independent — every
// fixture path is createTempDirectory- or nanoTime-scoped).
val testForkCount = sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "6").toInt
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val tests = (Test / definedTests).value.sortBy(_.name)
  tests.zipWithIndex.groupBy(_._2 % testForkCount).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      // derby boots only into an EXISTING system home
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"/tmp/graft-test-derby-$i"))
      Tests.Group(
        name = s"fork-$i",
        tests = ts.map(_._1),
        runPolicy = Tests.SubProcess(ForkOptions().withRunJVMOptions(
          opts ++ Vector(
            s"-Dspark.sql.warehouse.dir=/tmp/graft-test-wh-$i",
            s"-Dderby.system.home=/tmp/graft-test-derby-$i"))))
    }
}
// sbt caps concurrent forked test groups at 1 by default — lift it to
// the group count (each group is a 4-core local session; 6 × 4 fits
// the 32-core box), and keep everything else at the default limit.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkCount),
  Tags.limitAll(math.max(testForkCount, 4)))
