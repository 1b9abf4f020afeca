package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair list —
  * the clustering engine behind d07 (near-dup clusters).
  *
  * Two interchangeable algorithms with the same contract
  * (`pairs(doc_a, doc_b)` → `(node, label)` where label = min node id
  * reachable in the pair graph):
  *
  *  - [[propagate]]: Pregel-style min-label propagation. One
  *    equi-join + groupBy per round, rounds = component DIAMETER.
  *    The right default for near-dup graphs, whose components are
  *    shallow stars (a handful of rounds).
  *  - [[starContraction]]: alternating large-star/small-star
  *    contraction (Kiveris et al., "Connected Components in
  *    MapReduce and Beyond", SoCC'14 — public algorithm). Rounds =
  *    O(log n) regardless of diameter, so a pathological chain-shaped
  *    component (e.g. a template family where A≈B≈C≈… but A̸≈C) that
  *    would blow propagation's round cap converges in ~log₂ rounds.
  *
  * Both loops are driver-orchestrated but move only a per-round
  * Boolean to the driver; every round's data stays distributed, and
  * `localCheckpoint` pins each round to materialized partitions so
  * the logical plan doesn't double per iteration.
  */
object Components {

  /** Min-label propagation to a fixpoint. Throws (loudly, not
    * silently-wrong) if the fixpoint needs more than `maxIter`
    * rounds — switch to [[starContraction]] for such graphs. */
  def propagate(pairs: DataFrame, maxIter: Int = 64): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label").as("nlabel"))
        .groupBy("node").agg(min("nlabel").as("nlabel"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.withColumnRenamed("label", "prev"), "node")
        .filter(col("label") =!= col("prev")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge within $maxIter rounds")
    labels
  }

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the minimum of its closed neighborhood. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u")
      .agg(least(min(col("v")), first(col("u"))).as("m"))
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node connects its smaller neighbors
    * (and itself) to the smallest of them.
    *
    * Input contract: a (u > v)-canonical DISTINCT edge frame —
    * exactly [[largeStar]]'s output invariant (it emits (old_v, m)
    * with m ≤ old_u < old_v, then distincts), and the loop only ever
    * composes smallStar(largeStar(_)). The re-canonicalization +
    * distinct this used to open with (greatest/least + filter +
    * distinct) was therefore an IDENTITY that cost one corpus-scale
    * exchange + aggregate per contraction round (r18 opt pass, guide
    * §2.4: "a distinct on data that is already unique") — at 10
    * rounds, 10 shuffles of the full working edge set. Rows are
    * bit-identical with or without it. */
  private def smallStar(o: DataFrame): DataFrame = {
    val m = o.groupBy("u").agg(min(col("v")).as("m"))
    val rewired = o.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val parent = m.select(col("u"), col("m").as("v"))
    rewired.union(parent).filter(col("u") =!= col("v")).distinct()
  }

  /** The ONE legal composition (ADVICE r18): [[smallStar]]'s input
    * contract — (u > v)-canonical and distinct — is exactly
    * [[largeStar]]'s output invariant, and nothing else may call
    * smallStar directly. Keeping the pair fused in one private
    * method is the structural tie that stops a future caller (or a
    * largeStar edit that drops the trailing distinct) from silently
    * breaking component labels. */
  private def smallStarOfLargeStar(e: DataFrame): DataFrame =
    smallStar(largeStar(e))

  /** Release a superseded round's localCheckpoint blocks eagerly
    * (g08 cost pass, VERDICT r15 #3/#4: every round's blocks used to
    * stay pinned until the loop's frames were garbage-collected).
    * Safe ONLY for frames nothing downstream references — a released
    * checkpoint cannot recompute (the lineage was truncated), so the
    * final round's frame is never passed here. */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Advance an iterative driver loop's frame under the ONE
    * checkpoint discipline (VERDICT r16 #4 — [[starContraction]] and
    * Quality.trainLoop each hand-rolled it, and both halves are
    * subtle enough to have produced real bugs: plan accretion OOM'd
    * t30's 24-round run building explain strings in round 16, and
    * releasing the superseded frame BEFORE materializing the next
    * recomputes the full lineage back to the corpus scan every round,
    * ADVICE r15):
    *  1. LAZILY localCheckpoint `next` — the plan truncates (O(1) in
    *     rounds) and no extra job runs when the round's own action
    *     materializes it;
    *  2. run `materialize` over the checkpointed frame — the round's
    *     own action(s): argmax, count, convergence probe, or an
    *     explicit foreachPartition for rounds with no action of
    *     their own. It may still read the SUPERSEDED frame (the
    *     contraction's membership probe does) — release has not
    *     happened yet;
    *  3. eagerly release the superseded frame's blocks (the
    *     [[releaseCheckpoint]] contract: nothing may read it after).
    * Returns the checkpointed frame and materialize's result.
    *
    * The OTHER two driver loops deliberately do NOT use this: the
    * PageRank fixed point runs a compile-time-constant 4 rounds
    * (plan depth is bounded — checkpoint blocks would cost more than
    * the lineage), and p25's MMR feeds each round's ≤k picks back as
    * a COLLECTED literal (bounded control state — the lineage resets
    * by construction, no executor-side frame to checkpoint). */
  private[graft] def advance[A](superseded: DataFrame, next: DataFrame)
      (materialize: DataFrame => A): (DataFrame, A) = {
    val ck = next.localCheckpoint(false)
    val out = materialize(ck)
    releaseCheckpoint(superseded)
    (ck, out)
  }

  /** Alternating large-star/small-star contraction to a fixpoint.
    * At convergence the edge set is a forest of depth-1 stars rooted
    * at each component's min node; labels read straight off it.
    *
    * Per-round cost (g08 cost pass, VERDICT r15 #4): ONE job — the
    * lazy localCheckpoint materializes inside the same count() action
    * that reads the new edge count (the old shape ran an eager
    * checkpoint job + two count jobs + an except job every round).
    * The count compare gates the membership probe: a round that
    * changed the edge count — almost every pre-convergence round —
    * skips the except job entirely; the membership check runs only on
    * count-stable rounds (usually just the final one), where it alone
    * decides the fixpoint. Convergence semantics are unchanged:
    * fixpoint ⟺ same count AND no edge outside the previous set
    * (both sides distinct), so labels stay bit-identical. */
  def starContraction(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val nodes = pairs.select(col("doc_a").as("node"))
      .union(pairs.select(col("doc_b").as("node")))
      .distinct().localCheckpoint(true)
    var edges = pairs.toDF("u", "v")
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(false)
    var edgeCount = edges.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prev = edges
      val prevCount = edgeCount
      // ONE alternation round per advance — A/B-measured in the r18
      // opt pass: composing TWO rounds per checkpoint (halving the
      // driver barriers) read 12.3 s vs 5.6 s at sf0.1, because both
      // star steps reference their input 2–3× (sym's union, the
      // m/rewired/parent branches) and only the checkpoint stops
      // that fan-out from re-executing the whole uncheckpointed
      // subtree multiplicatively. The per-round barrier IS the
      // cheaper side of that trade.
      val (ck, (nextCount, changed)) =
        advance(prev, smallStarOfLargeStar(prev)) { n =>
          val c = n.count()
          // the membership probe reads the superseded frame — legal
          // inside materialize (release happens after)
          (c, c != prevCount || n.except(prev).limit(1).count() > 0)
        }
      edges = ck
      edgeCount = nextCount
      converged = !changed
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge within $maxIter rounds")
    // stars point u -> root v; roots (and isolated-in-star nodes)
    // label themselves
    nodes.join(edges.select(col("u").as("node"), col("v").as("root")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("root"), col("node")).as("label"))
  }
}
