package graft

import graft.operators.{Dedup, Pipeline, Similarity}
import org.apache.spark.sql.functions._

/** Round-8 operators: d19 bloom screen, p15 leakage-safe split,
  * s18 k-means-refined quantizer. Each is oracle-gated for VALUE
  * parity; these tests pin the SEMANTIC guarantees the oracle
  * cannot express (no-false-negative, no-straddle, monotone fit). */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- d19

  test("d19 bloom screen has NO false negatives: every true corpus dup is a hit") {
    // corpus ids 0..79 (id%10<8 slice); increment ids ≡ 8,9 mod 10.
    // Half the increment docs copy a corpus text verbatim.
    val corpus = (0 until 100).filter(_ % 10 < 8).map(i => (i.toLong, s"corpus text $i"))
    val dups = Seq((108L, "corpus text 3"), (118L, "corpus text 27"),
      (129L, "corpus text 55"), (139L, "corpus text 71"))
    val fresh = Seq((148L, "novel a"), (158L, "novel b"), (169L, "novel c"))
    val docs = (corpus ++ dups ++ fresh).toDF("doc_id", "text")
    val out = Dedup.d19From(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3))).toMap
    // every true dup: bloom hit (no false negative is STRUCTURAL —
    // the same 3 positions were set at build) and exact match found
    dups.foreach { case (id, text) =>
      val srcId = corpus.find(_._2 == text).get._1
      assert(out(id) === ((true, Some(srcId), "dup")), s"doc $id")
    }
    // fresh docs: either screened (no corpus join) or an honest FP
    fresh.foreach { case (id, _) =>
      val (hit, m, outcome) = out(id)
      assert(m.isEmpty)
      assert(if (hit) outcome == "false_positive" else outcome == "screened")
    }
  }

  test("d19 on the fixture: exact verdicts agree with d15 and FP rate is in envelope") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val d19 = Dedup.d19From(docs).collect()
    val d15Exact = Dedup.d15IncrementalDedup(spark, sf)
      .filter(col("verdict") === "drop_exact")
      .select("doc_id", "exact_match").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d19Dup = d19.filter(_.getString(3) == "dup")
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(d19Dup === d15Exact) // same screen decision as the exact join
    val nonDup = d19.count(_.getString(3) != "dup")
    val fp = d19.count(_.getString(3) == "false_positive")
    assert(nonDup > 0)
    // 10 bits/element, k=3 ⟹ ~1.8% expected; 10% is a loose 5× cap
    assert(fp.toDouble / nonDup < 0.10, s"fp=$fp of $nonDup")
  }

  test("qa05 bloom curve: dup count invariant across sizes, FP mass shrinking") {
    val rows = Dedup.qa05BloomCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Dedup.BloomBitsGrid)
    // no false negatives at ANY filter size: the dup set is the
    // exact-match set, found through every filter
    assert(rows.map(_._3).distinct.length === 1)
    // the FP mass shrinks as the filter grows (deterministic on the
    // fixture: 55 → 8 → 1 → 0 of 100 at sf0.001)
    rows.sliding(2).foreach { case Array(a, b) => assert(b._4 <= a._4) case _ => }
    assert(rows.last._4 < rows.head._4)
  }

  test("qa06 CMS: never undercounts, and collision bias appears under a wide vocabulary") {
    // fixture run: 31-token vocab over 4096 cells — bias must be 0
    val fix = graft.operators.Quality.qa06CmsAccuracy(spark, sf).collect()
    assert(fix.length === 20)
    fix.foreach(r => assert(r.getLong(3) === 0L))
    // forced-collision run: 5000 distinct terms over 1024 columns —
    // the estimate must STILL never undercount (the CMS guarantee)
    // and some top term must show positive bias (the sketch is
    // actually approximating, not accidentally exact)
    val wide = (1 to 5000).map(i => s"tok$i " * (if (i <= 20) 50 else 1))
      .toDF("text")
    val rows = graft.operators.Quality.qa06From(wide).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 20)
    rows.foreach { case (t, exact, est, over) =>
      assert(est >= exact, s"$t undercounted: $est < $exact")
      assert(over === est - exact)
    }
    assert(rows.exists(_._4 > 0), "no collision bias at 5000 terms / 1024 cols")
  }

  // ---------------------------------------------------------- p15

  test("p15 cluster split: constant per cluster, q20 tie-back for singletons, straddle flag honest") {
    val out = Pipeline.p15ClusterSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    // the cluster-keyed rule cannot straddle: one split per cluster
    val perCluster = out.groupBy(_._2)
    perCluster.foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.size === 1, s"cluster $c straddles")
    }
    // singleton docs keep exactly the naive q20 assignment
    perCluster.filter(_._2.size == 1).foreach { case (_, Array((_, _, s, n, strad))) =>
      assert(s === n); assert(!strad)
    }
    // straddled == the naive rule would have split this cluster
    perCluster.foreach { case (c, rows) =>
      val naiveDistinct = rows.map(_._4).distinct.size
      rows.foreach { r => assert(r._5 === (naiveDistinct > 1), s"cluster $c") }
    }
    // and the flag actually fires somewhere on the fixture (the
    // operator exists because the leak is real)
    assert(out.exists(_._5), "fixture has no straddled cluster — leak test vacuous")
  }

  test("p16 split balance: shares sum to one and drift nets out per source") {
    val rows = Pipeline.p16SplitBalance(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-9, s"$src shares")
      assert(math.abs(rs.map(_._6).sum - 1.0) < 1e-9, s"$src naive shares")
      // both rules assign every doc of the source exactly once, so
      // the drift is a pure reshuffle — it nets to zero
      assert(rs.map(_._3).sum === rs.map(_._4).sum, s"$src mass")
      assert(math.abs(rs.map(_._7).sum) < 1e-9, s"$src drift")
    }
    // the fixture has straddled clusters (pinned above), so SOME
    // cell must have moved mass
    assert(rows.exists(r => r._3 != r._4), "drift vacuous on fixture")
  }

  test("mm06 scene index: constructed static/alternating shots segment correctly") {
    import graft.operators.Multimodal
    // frames as (doc_id, frame_no, frame_md5) directly: doc 1 = one
    // static shot, doc 2 = alternating A/B, doc 3 = AAB BBA runs
    val frames = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "A"), (1L, 4L, "A"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "A"), (2L, 4L, "B"),
      (3L, 1L, "A"), (3L, 2L, "A"), (3L, 3L, "B"),
      (3L, 4L, "B"), (3L, 5L, "B"), (3L, 6L, "A")
    ).toDF("doc_id", "frame_no", "frame_md5")
    val got = Multimodal.mm06From(frames).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) === ((4L, 1L, 3L, 4L))) // one 4-frame static shot
    assert(got(2L) === ((4L, 4L, 0L, 1L))) // every frame a boundary
    assert(got(3L) === ((6L, 3L, 3L, 3L))) // AA | BBB | A
    // fixture docs are all-distinct frames: n_scenes == n_frames
    val fix = Multimodal.mm06SceneIndex(spark, sf).collect()
    fix.foreach(r => assert(r.getLong(1) === r.getLong(2) && r.getLong(3) === 0L))
  }

  test("mm07 scene sample: first-of-scene manifest, exact payload coverage") {
    import graft.operators.Multimodal
    // same constructed shots as the mm06 test, plus byte offsets
    val frames = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "A"), (1L, 4L, "A"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "A"), (2L, 4L, "B"),
      (3L, 1L, "A"), (3L, 2L, "A"), (3L, 3L, "B"),
      (3L, 4L, "B"), (3L, 5L, "B"), (3L, 6L, "A")
    ).map { case (d, f, h) => (d, f, (f - 1) * 32, h) }
      .toDF("doc_id", "frame_no", "byte_off", "frame_md5")
    val got = Multimodal.mm07From(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4),
        r.getLong(5), r.getLong(6)))
    // doc 1: one sample representing the whole static shot
    assert(got.filter(_._1 == 1L).toSeq === Seq((1L, 1L, 1L, "A", 4L, 3L)))
    // doc 2: every frame sampled, nothing saved
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq ===
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
    assert(got.filter(_._1 == 2L).forall(_._6 == 0L))
    // doc 3: AA | BBB | A -> samples at frames 1, 3, 6
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3, t._4, t._5)).toSeq ===
      Seq((1L, 1L, "A", 2L), (2L, 3L, "B", 3L), (3L, 6L, "A", 1L)))
    // exact coverage: sampled payload set == full distinct payload set
    val all = frames.collect().map(r => r.getLong(0) -> r.getString(3))
    (1L to 3L).foreach { d =>
      assert(got.filter(_._1 == d).map(_._4).toSet ===
        all.filter(_._1 == d).map(_._2).toSet, s"doc $d coverage")
    }
    // tie-back: per-doc sample count == mm06's n_scenes, and the
    // saved mass == mm06's n_static
    val mm6 = Multimodal.mm06From(frames.select("doc_id", "frame_no", "frame_md5"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (1L to 3L).foreach { d =>
      assert(got.count(_._1 == d).toLong === mm6(d)._1)
      assert(got.filter(_._1 == d).map(_._6).sum === mm6(d)._2)
    }
  }

  test("mm08 silence segments: constructed speech/silence alternations") {
    import graft.operators.Multimodal
    val clips = Seq(
      (1L, "a" * 64),                          // all speech
      (2L, " " * 32 + "a" * 32 + " " * 32),    // silence|speech|silence
      (3L, " " * 64),                          // all silence
      (4L, " " * 31 + "z")                     // one mixed window: speech
    ).map { case (d, t) => (d, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val got = Multimodal.mm08From(clips).collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))).toMap
    assert(got(1L) === ((2L, 0L, 1L, 0L, 0L, 1.0)))
    assert(got(2L) === ((3L, 2L, 3L, 2L, 1L, 1.0 / 3)))
    assert(got(3L) === ((2L, 2L, 1L, 1L, 2L, 0.0)))
    assert(got(4L) === ((1L, 0L, 1L, 0L, 0L, 1.0))) // letter breaks silence
    // fixture: window mass conserved, ratios bounded
    Multimodal.mm08SilenceSegments(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("qa11 CMS width curve: bias real at 16, vanishing with width, never negative") {
    import graft.operators.Quality
    val rows = Quality.qa11CmsWidthCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    assert(rows.map(_._1).distinct.sorted.toSeq === Quality.CmsWidthGrid)
    // CMS never undercounts at ANY width
    assert(rows.forall(_._4 >= 0L))
    // per term, exact_n is width-independent (same exact side)
    rows.groupBy(_._2).foreach { case (t, rs) =>
      assert(rs.map(_._3).distinct.length === 1, t)
    }
    // the sizing curve: total bias is non-increasing in width, and
    // the 16-counter setting actually collides on this vocabulary
    val bias = Quality.CmsWidthGrid.map(w =>
      rows.filter(_._1 == w).map(_._4).sum)
    assert(bias.zip(bias.tail).forall { case (a, b) => a >= b }, bias)
    assert(bias.head > 0L, "width-16 bias vacuous — curve shows nothing")
  }

  test("p17 epoch plan: budget respected, epoch identity, flag honest") {
    val rows = Pipeline.p17EpochPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    // integer rounding only ever UNDER-allocates the budget
    assert(rows.map(_._4).sum <= total * 3)
    rows.foreach { case (src, nTok, w, target, full, rem, frac, over4) =>
      assert(w === math.sqrt(nTok.toDouble).toLong, src)
      assert(target === full * nTok + rem, src) // div/mod identity
      assert(rem >= 0 && rem < nTok, src)
      assert(math.abs(frac - target.toDouble / nTok) < 1e-12, src)
      assert(over4 === (target > nTok * 4), src)
    }
    // sqrt damping: every source lands within [1x, 3x*|s|] epochs and
    // the plan is non-vacuous (the budget forces multi-epoch reuse)
    assert(rows.exists(_._5 >= 2), "no source scheduled past epoch 1")
  }

  test("d20 containment: planted subset pair found, flagged jaccard-blind") {
    // doc 2 is doc 1's first sentence pasted into a much longer page:
    // containment(1 in 2) = 1.0 while jaccard stays far below the
    // d02/d04 regime — the pair Jaccard dedup misses by construction
    val short = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 40).map(i => s"filler$i word$i token$i").mkString(" ")
    val docs = Seq(
      (1L, short),
      (2L, short + " " + filler),
      (3L, "unrelated text entirely different body here")
    ).toDF("doc_id", "text")
    val got = Dedup.d20From(docs).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getDouble(5) === 1.0) // full containment of the short side
    assert(r.getDouble(6) < 0.5)   // symmetric jaccard misses it
    assert(r.getBoolean(7))        // ... and the flag says so
    // cross-check vs d04's symmetric measure on the fixture: every
    // d20 pair's jaccard must agree with the source-blocked d04 row
    // when one exists (same shingle algebra underneath)
    val fixture = Dedup.d20Containment(spark, sf).collect()
    assert(fixture.forall(r => r.getDouble(5) >= 0.8))
    assert(fixture.forall(r =>
      r.getLong(2) <= math.min(r.getLong(3), r.getLong(4))))
  }

  test("t17 token gini: constructed extremes match the exact rational identity") {
    import graft.operators.Quality
    val docs = Seq(
      (1L, "a a a a"),  // single type: zero diversity, full dominance
      (2L, "a b c d"),  // uniform: gini = 1 - 4/16
      (3L, "a a a b")   // skewed: ssq = 9 + 1
    ).toDF("doc_id", "text")
    val got = Quality.t17From(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got(1L) === ((4L, 1L, 16L, 0.0, 1.0)))
    assert(got(2L) === ((4L, 4L, 4L, 0.75, 0.25)))
    assert(got(3L) === ((4L, 2L, 10L, 0.375, 0.75)))
    // fixture-wide bounds: gini in [0, 1), top_share in (0, 1],
    // and gini == 0 exactly when the doc has one type
    Quality.t17TokenGini(spark, sf).collect().foreach { r =>
      val (types, g, ts) = (r.getLong(2), r.getDouble(4), r.getDouble(5))
      assert(g >= 0.0 && g < 1.0 && ts > 0.0 && ts <= 1.0)
      assert((g == 0.0) === (types == 1L))
    }
  }

  test("p18 read plan: every shard dealt once per epoch, rotation re-deals") {
    val rows = Pipeline.p18ReadPlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val epochs = rows.map(_._1).distinct.sorted
    assert(epochs === Seq(1L, 2L, 3L))
    // within an epoch: 16 shards dealt exactly once over 8 ranks,
    // token shares summing to 1 and doc mass conserved
    val total = rows.filter(_._1 == 1L).map(_._4).sum
    epochs.foreach { e =>
      val er = rows.filter(_._1 == e)
      assert(er.map(_._3).sum === 16L, s"epoch $e shard count")
      assert(er.map(_._4).sum === total, s"epoch $e doc mass")
      assert(math.abs(er.map(_._6).sum - 1.0) < 1e-9, s"epoch $e shares")
    }
    // the rotation actually re-deals: per-rank token mass shifts
    // between consecutive epochs (shard->rank map changes by +1 mod 8)
    val byEpoch = epochs.map(e =>
      rows.filter(_._1 == e).map(t => t._2 -> t._5).toMap)
    assert(byEpoch(0) != byEpoch(1) || byEpoch(0).values.toSet.size == 1)
  }

  // ---------------------------------------------------------- s18

  test("s18 k-means refinement: fit improves, mass conserved, k bounded") {
    val out = Similarity.s18KmeansRefine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.length <= 64)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(out.map(_._2).sum === n) // every vector assigned, round 0
    assert(out.map(_._3).sum === n) // ... and round 2
    val wInit = out.flatMap(t => t._4.map(_ * t._2)).sum / out.map(_._2).sum
    val wFinal = out.flatMap(t => t._5.map(_ * t._3)).sum / out.map(_._3).sum
    // Lloyd monotonicity survives the integer truncation on the
    // fixture by a wide margin (measured: 377k → 497k micro-cos)
    assert(wFinal > wInit + 1000.0, s"init=$wInit final=$wFinal")
  }

  test("s19: quantizer training does not regress retrieval recall at equal probes") {
    val rows = Similarity.s19RefinedRecall(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    val mean = rows.groupBy(_._1).map { case (m, rs) =>
      m -> rs.map(_._2).sum / rs.length
    }
    // measured on the fixture: seed 0.464, refined 0.504 — pin the
    // direction with slack for fixture regeneration
    assert(mean("refined") >= mean("seed") - 0.02,
      s"refined ${mean("refined")} vs seed ${mean("seed")}")
  }

  test("s18 refinement is deterministic and replication-stable on a doubled corpus") {
    // appending an id-shifted copy of every vector must not change
    // the REFINED cell geometry story: same cells survive, occupancy
    // exactly doubles only if the stride seeds stay aligned — which
    // they do not in general, so pin the cheap invariants instead:
    // determinism across two runs and mass conservation at 2×.
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val run1 = Similarity.s18From(e).collect()
    val run2 = Similarity.s18From(e).collect()
    assert(run1.toSeq === run2.toSeq)
    val shift = e.count()
    val doubled = e.unionByName(
      e.select((col("vec_id") + lit(shift * 2)).as("vec_id"), col("embedding")))
    val out2 = Similarity.s18From(doubled).collect()
    assert(out2.map(_.getLong(1)).sum === shift * 2)
    assert(out2.map(_.getLong(2)).sum === shift * 2)
  }
}
