package graft

import graft.operators.AsOf
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asofJoin picks latest strictly-earlier right row per key") {
    val left = Seq(
      (1L, "u1", ts(100)), (2L, "u1", ts(200)), (3L, "u2", ts(150)))
      .toDF("id", "user", "t")
    val right = Seq(
      (10L, "u1", ts(50)), (11L, "u1", ts(150)), (12L, "u1", ts(250)),
      (13L, "u2", ts(150)))
      .toDF("id", "user", "t")

    val out = AsOf.asofJoin(left, right, Seq("user"), "t", "id", Seq("t", "id"))
      .select("id", "asof_id").as[(Long, Option[Long])].collect().toMap

    assert(out(1L).contains(10L)) // only ts(50) precedes ts(100)
    assert(out(2L).contains(11L)) // ts(150) latest before ts(200)
    // u2: right row shares ts(150); right sorts before left on tie
    // (id 13 < id 3 is false — tie broken by id: 3 < 13 so right is AFTER)
    assert(out(3L).isEmpty)
  }

  test("asofJoin attaches the latest right ROW atomically, nulls included") {
    // right at t=1 has (a=1, b=1); the LATEST right at t=2 has
    // (a=null, b=2). The left row must see (null, 2) — a per-column
    // fill would compose the never-existed row (1, 2)
    val left = Seq((100L, "k", ts(3))).toDF("id", "user", "t")
    val right = Seq(
      (10L, "k", ts(1), Some(1L), 1L),
      (11L, "k", ts(2), None: Option[Long], 2L))
      .toDF("id", "user", "t", "a", "b")
    val out = AsOf.asofJoin(left, right, Seq("user"), "t", "id", Seq("a", "b"))
      .select("asof_a", "asof_b").as[(Option[Long], Long)].head()
    assert(out === ((None, 2L)))
  }

  test("asofJoin keeps every left row (no inner-join loss)") {
    val left = Seq((1L, "x", ts(10))).toDF("id", "user", "t")
    val right = spark.emptyDataset[(Long, String, Timestamp)]
      .toDF("id", "user", "t")
    val out = AsOf.asofJoin(left, right, Seq("user"), "t", "id", Seq("id"))
    assert(out.count() === 1)
    assert(out.select("asof_id").first().isNullAt(0))
  }
}
