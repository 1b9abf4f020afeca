package graft

import graft.operators.Skew
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  // Suites share one JVM/session, so the spark.sql.extensions conf of a
  // fresh builder wouldn't apply; register into the live session. (The
  // conf path itself — spark.sql.extensions=graft.plans.GraftExtensions
  // on a fresh JVM — is exercised manually from an external session.)
  lazy val spark: SparkSession = {
    val s = GraftSession.local(cores = 4, appName = "ExtensionsSpec")
    graft.plans.GraftExtensions.register(s)
    s
  }

  test("regexp_extract_groups is callable from SQL") {
    import spark.implicits._
    val out = spark.sql(
      """SELECT regexp_extract_groups('Jan 02 03:04:05 mx1 postfix/smtpd[9]: hi',
        |  '^([a-zA-Z]{1,3}\\s[0-9]{2}\\s[0-9]{2}:[0-9]{2}:[0-9]{2})\\s([\\S]+)\\s([\\S]+)\\[([0-9]+)\\]:\\s?(.*)$') AS g
        |""".stripMargin)
      .selectExpr("g[2]", "g[4]", "g[5]").as[(String, String, String)].first()
    assert(out === (("mx1", "9", "hi")))
    val miss = spark.sql("SELECT regexp_extract_groups('nope', '^([0-9]+)$') AS g")
      .selectExpr("g IS NULL").first().getBoolean(0)
    assert(miss)
  }

  test("long_array_sum is callable from SQL and groups element-wise") {
    import spark.implicits._
    Seq((1L, Seq(1L, 2L)), (1L, Seq(3L, 4L)), (2L, Seq(7L, -7L)))
      .toDF("g", "a").createOrReplaceTempView("las_in")
    val out = spark.sql(
      "SELECT g, long_array_sum(a) AS s FROM las_in GROUP BY g ORDER BY g")
      .as[(Long, Seq[Long])].collect()
    assert(out.toSeq === Seq((1L, Seq(4L, 6L)), (2L, Seq(7L, -7L))))
  }

  test("DotProductRewrite swaps the HOF dot product for long_array_dot") {
    import spark.implicits._
    // a file-backed relation: a local Seq would constant-fold into a
    // LocalRelation before the rewrite has anything to match
    val dir = java.nio.file.Files.createTempDirectory("dotin").toString
    Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), (Seq(10L, -2L), Seq(3L, 7L)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("dot_in")
    val hof = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d FROM dot_in ORDER BY d")
    assert(hof.queryExecution.optimizedPlan.toString.contains("long_array_dot"),
      "rewrite must fire on the canonical HOF spelling")
    assert(hof.as[Long].collect().toSeq === Seq(16L, 32L))
    // operand order flipped in both lambdas — still the same algebra
    val rev = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> y * x), 0L, (acc, v) -> v + acc) AS d FROM dot_in")
    assert(rev.queryExecution.optimizedPlan.toString.contains("long_array_dot"))
    // a non-product zip lambda must NOT be rewritten, and must still
    // evaluate through the untouched HOF path
    val neg = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (acc, v) -> acc + v) AS d FROM dot_in ORDER BY d")
    assert(!neg.queryExecution.optimizedPlan.toString.contains("long_array_dot"))
    assert(neg.as[Long].collect().toSeq === Seq(18L, 21L))
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    // skewed big side: 90% of rows share key 1
    val big = (1 to 1000).map(i => (if (i <= 900) 1 else i, s"v$i")).toDF("k", "v")
    val small = Seq((1, "one"), (50, "fifty"), (999, "nn")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    assert(salted.length === 901) // 900 hot key-1 rows + key 999 (key 50 absent from big)
  }
}
