package graft

import graft.operators.{AsOf, Skew}
import graft.plans.LongArrayDot
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized (fixed-seed) equivalence checks: each distributed
  * operator is compared against a straightforward single-machine
  * reference implementation on generated data. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  test("asofJoin equals the naive per-row reference on random data") {
    val users = (1 to 8).map(u => s"u$u")
    val left = (1 to 150).map { i =>
      (i.toLong, users(rnd.nextInt(users.size)), new Timestamp(rnd.nextInt(100000).toLong * 1000))
    }
    val right = (1000 to 1200).map { i =>
      (i.toLong, users(rnd.nextInt(users.size)), new Timestamp(rnd.nextInt(100000).toLong * 1000))
    }
    val got = AsOf.asofJoin(
        left.toDF("id", "user", "t"), right.toDF("id", "user", "t"),
        Seq("user"), "t", "id", Seq("id"))
      .select("id", "asof_id").as[(Long, Option[Long])].collect().toMap

    // reference: latest right with (t, id) strictly before left's (t, id)
    left.foreach { case (lid, user, lt) =>
      val want = right.filter { case (rid, ru, rt) =>
        ru == user && (rt.before(lt) || (rt == lt && rid < lid))
      }.sortBy { case (rid, _, rt) => (rt.getTime, rid) }.lastOption.map(_._1)
      assert(got(lid) === want, s"left id $lid")
    }
  }

  test("saltedJoin equals plain join on skewed random data") {
    val big = (1 to 2000).map { _ =>
      val k = if (rnd.nextDouble() < 0.7) 7 else rnd.nextInt(40)
      (k, rnd.nextInt(1000))
    }.toDF("k", "v")
    val small = (0 until 40 by 3).map(k => (k, s"dim$k")).toDF("k", "name")
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val plain = big.join(small, Seq("k"), jt).collect().map(_.toString).sorted
      val salted = Skew.saltedJoin(big, small, "k", 8, jt).collect().map(_.toString).sorted
      assert(salted.sameElements(plain), s"join type $jt")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 8, "full_outer")
    }
  }

  test("LongArrayDot equals BigInt reference incl. negatives and length skew") {
    val cases = (1 to 50).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextLong() % 1000000), Seq.fill(n)(rnd.nextLong() % 1000000))
    }
    val got = cases.toDF("a", "b")
      .select(LongArrayDot($"a", $"b").as("dot")).as[Long].collect()
    cases.zip(got).foreach { case ((a, b), d) =>
      val want = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      assert(BigInt(d) === want, "within-long-range dot must be exact")
    }
  }
}
