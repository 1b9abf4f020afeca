package graft

import graft.operators.Components
import org.apache.spark.sql.DataFrame
import scala.util.Random

/** Both connected-components algorithms agree with each other and
  * with a single-machine union-find reference, including on graphs
  * whose diameter exceeds what propagation could ever finish. */
class ComponentsSpec extends SparkSpec {

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  /** Single-machine reference: union-find with min-id roots. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def collectLabels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs: propagate == starContraction == union-find") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 30
      val pairs = Seq.fill(n)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(pairs)
      val df = pairsDf(pairs)
      assert(collectLabels(Components.propagate(df)) == expected,
        s"propagate diverged on trial $trial")
      assert(collectLabels(Components.starContraction(df)) == expected,
        s"starContraction diverged on trial $trial")
    }
  }

  test("chain of diameter 200: starContraction converges in O(log n) rounds") {
    val pairs = (0L until 200L).map(i => (i, i + 1))
    val labels = collectLabels(Components.starContraction(pairsDf(pairs)))
    assert(labels.size == 201)
    assert(labels.values.forall(_ == 0L))
  }

  test("propagate fails loudly past its round cap instead of truncating") {
    val pairs = (0L until 30L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Components.propagate(pairsDf(pairs), maxIter = 5)
    }
  }

  test("self-loops and duplicate edges don't perturb either algorithm") {
    val pairs = Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L), (8L, 9L))
    val expected = Map(5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L)
    assert(collectLabels(Components.starContraction(pairsDf(pairs))) == expected)
    // propagate sees 5 via the (5,5) self-edge's symmetrization only
    assert(collectLabels(Components.propagate(pairsDf(pairs))) == expected)
  }

  test("two components keep distinct labels") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L))
    val labels = collectLabels(Components.starContraction(pairsDf(pairs)))
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  // ---- g08 communities over a constructed weighted graph ----

  private def edgesDf(e: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    e.toDF("x", "y", "w")
  }

  private def partsDf(p: Seq[(Long, String)]) = {
    import spark.implicits._
    p.toDF("p_partkey", "p_brand")
  }

  test("g08 core: sizes, edge mass and brand argmax on a known graph") {
    // two communities: {1,2,3} (triangle, mass 2+3+4) and {10,11}
    val e = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 4L), (10L, 11L, 5L))
    val p = Seq(1L -> "A", 2L -> "B", 3L -> "B", 10L -> "C", 11L -> "C")
    val got = graft.operators.Graph.communitiesFrom(edgesDf(e), partsDf(p))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 9L, 2L, "B", 2L),   // B wins 2-1; ties break smallest
      (10L, 2L, 1L, 5L, 1L, "C", 2L)))
  }

  test("g08 brand tie breaks to the smallest brand") {
    val e = Seq((1L, 2L, 2L))
    val p = Seq(1L -> "Z", 2L -> "A")
    val got = graft.operators.Graph.communitiesFrom(edgesDf(e), partsDf(p))
      .collect().map(r => (r.getString(5), r.getLong(6))).toSeq
    assert(got == Seq(("A", 1L)))
  }

  test("g08 disjoint-replica invariant: 10 offset copies = 10x the communities") {
    val base = Seq((1L, 2L, 2L), (2L, 3L, 3L), (10L, 11L, 5L))
    val parts = Seq(1L -> "A", 2L -> "B", 3L -> "B", 10L -> "C", 11L -> "C")
    val off = 1000L
    val e10 = (0 until 10).flatMap(k =>
      base.map { case (x, y, w) => (x + k * off, y + k * off, w) })
    val p10 = (0 until 10).flatMap(k =>
      parts.map { case (n, b) => (n + k * off, b) })
    val one = graft.operators.Graph.communitiesFrom(edgesDf(base), partsDf(parts))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6))).toSeq
    val ten = graft.operators.Graph.communitiesFrom(edgesDf(e10), partsDf(p10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6))).toSeq
    // each replica is an isomorphic copy: same rows with shifted ids
    val expected = (0 until 10).flatMap(k => one.map {
      case (c, np, ne, em, nb, tb, tp) => (c + k * off, np, ne, em, nb, tb, tp)
    }).sortBy(_._1)
    assert(ten == expected)
  }
}
