package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("quantized dot and norm are exact integers") {
    val df = Seq((Array(0.1f, -0.2f, 0.3f), Array(0.3f, 0.2f, -0.1f)))
      .toDF("a", "b")
      .select(TextFns.quantize($"a").as("qa"), TextFns.quantize($"b").as("qb"))
      .select(TextFns.qdot($"qa", $"qb").as("dot"), TextFns.qnorm2($"qa").as("na"))
    val r = df.first()
    // (1000, -2000, 3000) . (3000, 2000, -1000) = 3e6 - 4e6 - 3e6
    assert(r.getLong(0) === -4000000L)
    assert(r.getLong(1) === 1000L * 1000 + 2000L * 2000 + 3000L * 3000)
  }

  test("shingles are 1-based consecutive word 3-grams") {
    val out = Seq("a b c d").toDF("text")
      .select(TextFns.shingleArray(TextFns.tokens($"text")).as("s"))
      .as[Seq[String]].first()
    assert(out === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextFns.shingleArray(TextFns.tokens($"text")).as("s"))
      .as[Seq[String]].first()
    assert(short.isEmpty)
  }

  test("affine hash family stays in [0, P)") {
    val h = Seq((0, 1L), (5, 12345L), (15, 2147483646L))
      .toDF("i", "x")
      .select(TextFns.affineHash($"i", $"x").as("h"))
      .as[Long].collect()
    assert(h.forall(v => v >= 0 && v < TextFns.HashP))
  }
}
