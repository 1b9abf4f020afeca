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

  test("packTokens two-phase prefix sum equals the naive reference across buckets") {
    // the testdata doc_ids all fit ONE 65536-wide bucket, so the
    // oracle rows never exercise the cross-bucket offset merge —
    // this pins it: ids spread over ~8 buckets, duplicated-token
    // sources, then compare against a local per-source running sum
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(500000).toLong, s"src${rnd.nextInt(3)}",
        (rnd.nextInt(300) + 1).toLong)
    }.distinctBy(_._1) // doc_id is the unique packing key
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val got = graft.operators.Pipeline.packTokens(df, 2048L)
      .select("doc_id", "source", "n_tokens", "bin_id", "bin_offset")
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expect = rows.groupBy(_._2).flatMap { case (_, rs) =>
      var run = 0L
      rs.sortBy(_._1).map { case (id, src, nt) =>
        val start = run; run += nt
        id -> ((src, nt, start / 2048L, start % 2048L))
      }
    }
    assert(got.size === expect.size)
    expect.foreach { case (id, want) =>
      assert(got(id) === want, s"doc $id diverged from the naive reference")
    }
  }

  test("d14 span pairs: maximal runs, no fragmentation, screen respected") {
    // doc 1 and 2 share one verbatim 15-token span at different
    // offsets; doc 3 shares nothing long enough. Tokens are unique
    // words so the seed-frequency screen never trips.
    val span = (1 to 15).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"one two three four $span"),
      (3L, "totally different words with no overlap at all here okay"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.spanPairsFrom(docs).collect()
    // ONE maximal span — the 8 seed matches on one diagonal merge
    // into a single row (a fragmented result would list sub-spans)
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("doc_a") === 1L)
    assert(r.getAs[Long]("doc_b") === 2L)
    assert(r.getAs[Long]("a_start") === 3L) // after "alpha beta"
    assert(r.getAs[Long]("b_start") === 5L) // after "one two three four"
    assert(r.getAs[Long]("span_tokens") === 15L)

    // a random within-pair check: the reported span really is
    // verbatim-equal token-for-token in both documents
    val a = docs.filter($"doc_id" === 1L).head.getString(1).split("\\s+")
    val b = docs.filter($"doc_id" === 2L).head.getString(1).split("\\s+")
    val (as, bs, n) = (r.getAs[Long]("a_start").toInt - 1,
      r.getAs[Long]("b_start").toInt - 1, r.getAs[Long]("span_tokens").toInt)
    assert(a.slice(as, as + n).toSeq === b.slice(bs, bs + n).toSeq)
  }

  test("d09_production: substitution near-dups found, bounded by the exact twin") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val base = (1 to 40).map(i => f"tok$i%03d").mkString(" ") // 279 chars, stable
    def sub(s: String, at: Int*): String =
      at.foldLeft(s)((acc, i) => acc.updated(i, if (acc(i) == 'Z') 'Y' else 'Z'))
    val docs = Seq(
      (10L, "web", base),
      (11L, "web", sub(base, 40)),                    // 1 substitution → near-dup of 10
      (12L, "web", sub(base, 5 to 115 by 10: _*)),    // every 15-char chunk touched → screened out
      (13L, "web", (1 to 40).map(i => f"oth$i%03d").mkString(" ")) // same band, nothing shared
    ).toDF("doc_id", "source", "text")
      .withColumn("n_chars", length($"text"))
    val got = operators.Dedup.d09ProductionFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("nn_doc"), r.getAs[Long]("edit_dist"))).toMap
    assert(got === Map(10L -> ((11L, 1L)), 11L -> ((10L, 1L))),
      "only the substitution pair survives the chunk screen")
    // the reported distance is the true prefix Levenshtein, and the
    // production argmin can never BEAT the exact twin's block minimum
    val pfx = Map(10L -> base.take(120), 11L -> sub(base, 40).take(120))
    got.foreach { case (a, (b, d)) =>
      assert(d === lev(pfx(a), pfx(b)).toLong)
    }
    // the chunk-frequency screen: > 100 identical copies are dropped
    // from THIS screen entirely (a pipeline removes them via d01
    // exact dedup first) — no quadratic pair blowup on a mega-group
    val copies = (0 until 120).map(i => (1000L + i, "copy", base))
      .toDF("doc_id", "source", "text").withColumn("n_chars", length($"text"))
    assert(operators.Dedup.d09ProductionFrom(copies).count() === 0L,
      "the occurrence screen must drop a >100-copy chunk group")
  }

  test("t16 mini-BPE: hierarchical merges, and packing on tokenizer-token budgets") {
    // hand-computed fold outcomes (merge table order matters:
    // "the"/"ing"/"and" merge through the symbols earlier rules made)
    val f = Seq((1L, "the thin cat"), (2L, "and reading er"), (3L, "zzz"))
      .toDF("doc_id", "text")
    val got = f.select($"doc_id",
        operators.Quality.bpeTokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    // "the"→1, "thin"→[th][in]→2, "cat"→c+[at]→2        = 5
    // "and"→1, "reading"→[re],a,d,[ing]→4, "er"→1       = 6
    // "zzz" has no merge                                 = 3
    assert(got === Map(1L -> 5L, 2L -> 6L, 3L -> 3L))

    // the p02/p03 budget variant: packing on BPE-token counts is the
    // same two-phase prefix sum, verified against the naive per-source
    // running sum (tokenizer-faithful budgets — VERDICT r4 §missing 3)
    val sfdocs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        operators.Quality.bpeTokenCount($"text").as("n_tokens"))
    val rows = sfdocs.as[(Long, String, Long)].collect()
    val packed = operators.Pipeline.packTokens(sfdocs, 512L)
      .select("doc_id", "bin_id", "bin_offset")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var run = 0L
      rs.sortBy(_._1).foreach { case (id, _, nt) =>
        assert(packed(id) === ((run / 512L, run % 512L)),
          s"doc $id diverged on the BPE budget")
        run += nt
      }
    }
  }

  test("d17 incremental spans == d14 span pairs restricted to increment×corpus") {
    val span = (1 to 20).map(i => s"sh$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma"),  // corpus
      (2L, s"x y z $span w"),           // corpus — pairs with 1 in d14, NOT in d17
      (18L, s"one two $span three"),    // increment (id % 10 = 8)
      (40L, s"pre $span post"),         // corpus with id ABOVE other corpus ids
      (29L, "nothing shared here at all with anyone else truly okay fine")
    ).toDF("doc_id", "text")
    val got = operators.Dedup.incrementalSpansFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("inc_start"),
        r.getAs[Long]("corp_start"), r.getAs[Long]("span_tokens"))).toSet
    // reference: d14's symmetric pair set, reoriented to (inc, corp),
    // keeping exactly the pairs with one increment and one corpus side
    // (the seed screens agree — no term here is frequent enough to trip
    // either the global or the corpus-side cap)
    val d14 = operators.Dedup.spanPairsFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("a_start"),
        r.getAs[Long]("b_start"), r.getAs[Long]("span_tokens")))
    val expect = d14.collect {
      case (a, b, as, bs, n) if a % 10 < 8 && b % 10 >= 8 => (b, a, bs, as, n)
      case (a, b, as, bs, n) if a % 10 >= 8 && b % 10 < 8 => (a, b, as, bs, n)
    }.toSet
    assert(expect.nonEmpty && got === expect)
    assert(got.map(_._1) === Set(18L), "verdicts only for increment docs")
    assert(got.map(_._2) === Set(1L, 2L, 40L),
      "increment doc matched against every corpus doc sharing the span")
  }

  test("d18 incremental semdedup: sound verdicts, exact within-cell nearest") {
    val d18 = operators.Dedup
      .d18From(sources.Tables.embeddings(spark, sf).select("vec_id", "embedding"))
      .collect()
    assert(d18.nonEmpty)
    assert(d18.forall(_.getLong(0) % 10 >= 8), "verdicts only for increment vectors")
    // reference: brute-force nearest CORPUS vector per increment,
    // unrestricted by cells — quantized exactly like the operator
    import org.apache.spark.sql.functions._
    val e = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), functions.TextFns.quantize(col("embedding")).as("qv"))
      .withColumn("nrm", functions.TextFns.qnorm2(col("qv")))
    val inc = e.filter(col("vec_id") % 10 >= 8)
      .select(col("vec_id"), col("qv").as("qv_i"), col("nrm").as("ni"))
    val corp = e.filter(col("vec_id") % 10 < 8)
      .select(col("vec_id").as("corp_id"), col("qv").as("qv_c"), col("nrm").as("nc"))
    val brute = inc.crossJoin(corp)
      .select(col("vec_id"), col("corp_id"),
        functions.TextFns.qcos(functions.TextFns.qdot(col("qv_i"), col("qv_c")),
          col("ni"), col("nc")).as("cos"))
      .groupBy("vec_id").agg(max(col("cos")).as("best_cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var drops = 0
    d18.foreach { r =>
      val v = r.getLong(0)
      val verdict = r.getAs[String]("verdict")
      if (verdict == "drop_near") {
        drops += 1
        // SOUND: a drop decision is justified by a real ≥0.3 corpus
        // neighbor (cell restriction can only under-report, so every
        // reported neighbor exists globally too)
        assert(r.getAs[Double]("nearest_cos") >= 0.3, s"unjustified drop for $v")
        assert(brute(v) >= r.getAs[Double]("nearest_cos") - 1e-12,
          s"reported neighbor beats the global best for $v")
      }
    }
    assert(drops > 0, "fixture must produce at least one drop_near")
    // every increment whose GLOBAL best is far below threshold keeps
    // (cells cannot invent similarity)
    d18.filter(r => brute(r.getLong(0)) < 0.25).foreach { r =>
      assert(r.getAs[String]("verdict") == "keep",
        s"vector ${r.getLong(0)} dropped without a ≥0.3 neighbor anywhere")
    }
  }

  test("d19 bloom screen equals the local bit-for-bit simulation on random docs") {
    import graft.operators.Dedup
    // random corpus with planted duplicates — fixed seed, exercises
    // dup/screened/FP paths beyond the fixture's dup-free increments
    val texts = (0 until 300).map(i => (i.toLong, s"doc ${rnd.nextInt(100000)} ${rnd.nextInt(100000)}"))
    val dups = Seq((308L, texts(3)._2), (319L, texts(41)._2), (328L, texts(77)._2))
    val all = texts ++ dups
    val got = Dedup.d19From(all.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3))).toMap

    // local simulation: identical constants, identical arithmetic
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val P = Dedup.BloomP
    def xm(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16) % P
    val corpus = all.filter(_._1 % 10 < 8)
    val inc = all.filter(_._1 % 10 >= 8)
    // sized per DISTINCT corpus hash (the r18 convention — one
    // sizing definition across ship/rebuild/live screen); this
    // corpus has no planted dups so the counts coincide, but the
    // simulation states the convention it verifies
    val mbits = ((corpus.map(t => md5hex(t._2)).distinct.size.toLong * 10L) / 60L + 1L) * 60L
    def positions(s: String): Seq[Long] =
      Dedup.BloomHashes.map { case (a, b) => ((a * xm(s) + b) % P) % mbits }
    val bits = scala.collection.mutable.Set[Long]()
    corpus.foreach { case (_, t) => positions(t).foreach(bits += _) }
    val corpHash = corpus.groupBy(t => md5hex(t._2))
      .map { case (h, ds) => h -> ds.map(_._1).min }
    inc.foreach { case (id, t) =>
      val hit = positions(t).forall(bits.contains)
      val exact = if (hit) corpHash.get(md5hex(t)) else None
      val outcome =
        if (!hit) "screened" else if (exact.isDefined) "dup" else "false_positive"
      assert(got(id) === ((hit, exact, outcome)), s"doc $id")
    }
    // the planted dups must have come through as dups (no FN ever)
    assert(got(308L)._3 === "dup" && got(319L)._3 === "dup" && got(328L)._3 === "dup")
  }

  test("qa07 HLL equals the local bit-for-bit simulation and hits the error envelope") {
    import graft.operators.Quality
    // 5000 distinct single-token docs over 3 sources — the
    // ESTIMATING regime the 31-token fixture can't reach (there the
    // raw estimate sits in HLL's small-range overshoot zone)
    val docs = (0 until 5000).map(i =>
      (i.toLong, s"term${rnd.nextInt(1000000000)}x$i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val row = Quality.qa07From(docs).collect().head
    val exact = row.getAs[Long]("exact_distinct")
    assert(exact === docs.select("text").distinct.count())

    // local simulation: identical 60-bit md5-prefix hash, identical
    // bucket/rank arithmetic, registers merged by max
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val regs = scala.collection.mutable.Map[Long, Long]()
    docs.collect().foreach { r =>
      val x = java.lang.Long.parseLong(md5hex(r.getString(1)).take(15), 16)
      val bucket = x % 64
      val v = x >> 6
      val bitlen = if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)
      val rank = 55L - bitlen
      regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rank)
    }
    val simSum = regs.values.map(rk => 1L << (55 - rk)).sum +
      (64 - regs.size) * (1L << 55)
    assert(row.getAs[Long]("sum_scaled") === simSum, "scaled harmonic sum != simulation")
    assert(row.getAs[Long]("n_used") === regs.size.toLong)
    // mergeability is exact: per-source max-merge == global registers
    assert(row.getAs[Long]("merged_sum_scaled") === row.getAs[Long]("sum_scaled"))
    // batch register table equals the simulation row-for-row
    val gotRegs = Quality.hllRegistersOf(docs.select("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotRegs === regs.toMap, "register table != bit-for-bit simulation")
    // published envelope: std error 1.04/sqrt(64) ~ 13%; 3 sigma cap
    val est = row.getAs[Double]("est_raw")
    assert(math.abs(est - exact) / exact < 0.39,
      s"HLL raw estimate $est vs exact $exact outside 3-sigma envelope")
  }

  test("qa09 bottom-k sample: KMV estimate, merge re-take, bit-for-bit hashes") {
    import graft.operators.Quality
    val docs = (0 until 5000).map(i =>
      (i.toLong, s"kmv${rnd.nextInt(1000000000)}y$i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val rows = Quality.qa09From(docs).collect()
    assert(rows.length === 64)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 64L))
    val hv = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(hv.zip(hv.tail).forall { case (a, b) => a < b })
    // the per-source re-take reproduces the global sample on EVERY row
    assert(rows.forall(_.getBoolean(3)))
    // KMV envelope: std err ~ 1/sqrt(k-2) ~ 13%; 3-sigma cap
    val est = rows.head.getDouble(6)
    assert(math.abs(est - 5000) / 5000.0 < 0.39, s"KMV est $est vs 5000")
    // bit-for-bit: the sample IS the 64 smallest md5-prefix hashes
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.collect().map(_.getString(1)).distinct
      .map(t => (java.lang.Long.parseLong(md5hex(t).take(15), 16), t))
      .sortBy(_._1).take(64).toSeq
    assert(rows.map(r => (r.getLong(2), r.getString(1))).sortBy(_._1).toSeq === want)
    // below-k regime on the fixture: sample = whole vocab, est exact
    val fix = Quality.qa09BottomkSample(spark, sf).collect()
    val nd = fix.head.getLong(4)
    if (nd < 64) {
      assert(fix.length.toLong === nd)
      assert(fix.head.getDouble(6) === nd.toDouble)
    }
  }

  test("s18 k-means refinement equals the local integer-exact simulation") {
    import graft.operators.Similarity
    // random vectors, fixed seed; ids sparse so the stride rule is
    // exercised with gaps (k < 64 seeds survive)
    val vecs = (0 until 200).map { i =>
      (i.toLong * 7L, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val got = Similarity.s18From(vecs.toDF("vec_id", "embedding")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap

    // local: quantize, stride seeds, 2 Lloyd rounds with truncated
    // integer means — the same IEEE ops in the same order
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 10000)) }
    def nrm(a: Array[Long]): Long = a.map(x => x * x).sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(nrm(a).toDouble) * math.sqrt(nrm(b).toDouble))
    val stride = q.map(_._1).max / 64L + 1L
    var cents: Seq[(Long, Array[Long])] =
      q.filter(_._1 % stride == 0).map { case (id, v) => (id, v) }
    def assignAll(cs: Seq[(Long, Array[Long])]): Map[Long, (Long, Double)] =
      q.map { case (id, v) =>
        val best = cs.map { case (cid, cv) => (cid, cos(v, cv)) }
          .minBy { case (cid, c) => (-c, cid) }
        id -> (best._1, best._2)
      }.toMap
    def update(assign: Map[Long, (Long, Double)]): Seq[(Long, Array[Long])] =
      assign.groupBy(_._2._1).toSeq.map { case (cell, members) =>
        val vs = members.keys.toSeq.map(id => q.find(_._1 == id).get._2)
        val n = vs.size.toLong
        val mean = (0 until 64).map { d =>
          val s = vs.map(_(d)).sum
          (s - s % n) / n // truncation, the cross-engine rule
        }.toArray
        (cell, mean)
      }.filter(c => nrm(c._2) > 0).sortBy(_._1)
    val a0 = assignAll(cents)
    cents = update(a0)
    cents = update(assignAll(cents))
    val a2 = assignAll(cents)
    def agg(a: Map[Long, (Long, Double)]): Map[Long, (Long, Long)] =
      a.values.groupBy(_._1).map { case (cell, xs) =>
        cell -> (xs.size.toLong,
          xs.map(x => math.floor(x._2 * 1000000.0).toLong).sum)
      }
    val i0 = agg(a0); val i2 = agg(a2)
    val cells = (i0.keySet ++ i2.keySet).toSeq.sorted
    assert(got.keySet === cells.toSet)
    cells.foreach { cell =>
      val (n0, s0) = i0.getOrElse(cell, (0L, 0L))
      val (n2, s2) = i2.getOrElse(cell, (0L, 0L))
      val (gn0, gn2, gm0, gm2) = got(cell)
      assert(gn0 === n0 && gn2 === n2, s"cell $cell occupancy")
      if (n0 > 0) assert(gm0.get === s0.toDouble / n0, s"cell $cell init mean")
      else assert(gm0.isEmpty)
      if (n2 > 0) assert(gm2.get === s2.toDouble / n2, s"cell $cell final mean")
      else assert(gm2.isEmpty)
    }
  }

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

  test("t18 two-phase top-k equals the local reference over the scored frame") {
    // global top-10 must survive the 32-way local pre-selection: the
    // distributed two-phase result is compared against a plain sort
    // of the full per-(query, doc) score set collected locally
    val scored = graft.operators.TextAnalysis.bm25Scored(spark, sf)
      .select("query_id", "doc_id", "n_terms_hit", "score_micro")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = scored.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy { case (_, doc, _, s) => (-s, doc) }.take(10)
        .zipWithIndex.map { case ((_, doc, hit, s), i) => (qid, i + 1, doc, hit, s) }
    }.sortBy(t => (t._1, t._2))
    val got = graft.operators.TextAnalysis.t18Bm25(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want)
    // every query produced a full page and hit counts stay within the
    // query's own term count
    val qLens = graft.operators.TextAnalysis.Bm25Queries
      .map { case (q, ts) => q -> ts.size }.toMap
    assert(got.groupBy(_._1).values.forall(_.size == 10))
    assert(got.forall { case (q, _, _, hit, _) => hit >= 1 && hit <= qLens(q) })
  }

  test("t19 textrank: damping floor, mass bound, and a moved fixed point") {
    val r = graft.operators.TextAnalysis.t19Textrank(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty)
    // every rank sits on or above the damping base 0.15·1e6, and the
    // iteration moved SOMETHING off the uniform start (ranks differ)
    assert(r.forall(_._4 >= 150000L))
    assert(r.map(_._4).distinct.size > 1)
    // integer-division mass leak only ever LOSES mass: total rank is
    // bounded by the conserved ideal n·1e6
    assert(r.map(_._4).sum <= r.length * 1000000L)
  }

  test("q38 assoc rules: pair counts bounded by singles, lift consistent") {
    val r = graft.operators.Analytics3.q38AssocRules(spark, sf).collect()
    assert(r.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    r.foreach { row =>
      val (na, nb, nab) = (row.getLong(2), row.getLong(3), row.getLong(4))
      val (conf, lift) = (row.getDouble(5), row.getDouble(6))
      assert(nab >= 1 && nab <= math.min(na, nb))
      // both floats reproduce bit-for-bit from the integer columns —
      // the single-division rule the operator promises
      assert(conf == nab.toDouble / na)
      assert(lift == (nab * nUsers).toDouble / (na * nb))
    }
  }

  test("q39 transitions: probabilities normalized per from_type") {
    val r = graft.operators.Analytics3.q39Transitions(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (_, rows) =>
      // counts sum to the shared denominator and probabilities to ~1
      assert(rows.map(_._2).sum == rows.head._3)
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("g01 triangles: degree-oriented closure equals brute force, slots = 3x") {
    val e = graft.operators.Graph.copurchaseEdges(spark, sf)
    val tri = graft.operators.Graph.triangles(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force reference on the id-canonical edge set: every
    // (a<b<c) triple whose three edges exist
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val truth = for {
      (a, bs) <- adj.toSeq; b <- bs; c <- adj.getOrElse(b, Set.empty)
      if edges.contains((a, c))
    } yield (a, b, c)
    assert(tri.length == truth.length)
    // same triangle SET (corners may be rank- vs id-ordered)
    assert(tri.map { case (x, y, z) => Seq(x, y, z).sorted }.toSet ==
      truth.map { case (x, y, z) => Seq(x, y, z).sorted }.toSet)
    val g01 = graft.operators.Graph.g01Triangles(spark, sf).collect()
    assert(g01.map(_.getLong(2)).sum == 3L * truth.length)
  }

  test("g03 pagerank: damping floor, mass bound, moved fixed point") {
    val r = graft.operators.Graph.g03Pagerank(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty)
    assert(r.forall(_._4 >= 150000L))
    assert(r.map(_._4).distinct.size > 1)
    // integer-division mass leak only ever LOSES mass vs the
    // conserved ideal n·1e6
    assert(r.map(_._4).sum <= r.length * 1000000L)
  }

  test("q43 local-supplier: revenue only from same-nation pairs in the region") {
    val r = graft.operators.Analytics3.q43LocalSupplier(spark, sf).collect()
    assert(r.nonEmpty)
    // every reported nation is an ASIA nation
    val asia = graft.sources.Tables.nation(spark, sf)
      .join(graft.sources.Tables.region(spark, sf)
        .filter(col("r_name") === "ASIA"), col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(r.map(_.getString(0)).forall(asia))
    assert(r.forall(row => row.getDouble(1) > 0 && row.getLong(2) > 0))
  }

  test("qa12 skew audit: top keys exact, factor reproduces from integers") {
    val r = graft.operators.Analytics3.qa12SkewAudit(spark, sf).collect()
    assert(r.length == 10)
    val ns = r.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted.reverse)) // descending by count
    r.foreach { row =>
      val (n, nKeys, total, f) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))
      assert(f == (n * nKeys).toDouble / total)
      assert(f > 0.0)
    }
    // factors are monotone in the counts (shared denominator)
    val fs = r.map(_.getDouble(4))
    assert(fs.sameElements(fs.sorted.reverse))
  }

  test("g04 incremental triangles: categories sum to T(all) - T(old)") {
    val row = graft.operators.Graph.g04IncrementalTriangles(spark, sf).head()
    val (c1, c2, c3, added) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(added == c1 + c2 + c3)
    // the incremental accounting must equal the from-scratch diff
    def pairsOf(pred: org.apache.spark.sql.Column) = {
      val li = graft.sources.Tables.lineitem(spark, sf)
        .filter(pred).select(col("l_orderkey"), col("l_partkey"))
      val a = li.select(col("l_orderkey"), col("l_partkey").as("x"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("y"))
      a.join(b, Seq("l_orderkey")).filter(col("x") < col("y"))
        .select("x", "y").distinct()
    }
    val tAll = graft.operators.Graph.triangles(pairsOf(lit(true))).count()
    val tOld = graft.operators.Graph.triangles(
      pairsOf(col("l_orderkey") % 10 < 8)).count()
    assert(added == tAll - tOld,
      s"incremental $added vs from-scratch ${tAll - tOld}")
    assert(row.getLong(0) > 0 && added > 0)
  }

  test("q44 market share: per-year shares sum to 1, revenue conserved") {
    val r = graft.operators.Analytics3.q44MarketShare(spark, sf).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2), x.getDouble(3)))
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
      rows.foreach { row => assert(row._4 > 0.0 && row._4 <= 1.0) }
    }
  }

  test("s20 gram matrix: symmetric positive diagonal, local reference on a slice") {
    val r = graft.operators.Similarity.s20GramMatrix(spark, sf).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r.size == 64 * 65 / 2)
    // diagonal entries are sums of squares — strictly positive here
    (1 to 64).foreach(i => assert(r((i.toLong, i.toLong)) > 0))
    // local bit-exact reference on dims 1..4
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(f => math.round(f.toDouble * 10000)))
      .filter(_.length == 64)
    for (i <- 1 to 4; j <- i to 4) {
      val want = vecs.map(v => v(i - 1) * v(j - 1)).sum
      assert(r((i.toLong, j.toLong)) == want, s"gram($i,$j)")
    }
  }

  test("g02 jaccard: bounds and bit-exact single division") {
    val r = graft.operators.Graph.g02CopurchaseJaccard(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (nxy, nx, ny, j) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5))
      assert(nxy >= 2 && nxy <= math.min(nx, ny))
      assert(j == nxy.toDouble / (nx + ny - nxy))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q41 profile: one row per column, counts consistent") {
    val r = graft.operators.Analytics3.q41Profile(spark, sf).collect()
    assert(r.map(_.getString(0)).toSeq.sorted ==
      Seq("l_linestatus", "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
    val nRows = r.head.getLong(1)
    r.foreach { row =>
      assert(row.getLong(1) == nRows) // same table, same row count
      assert(row.getLong(2) <= nRows) // filled <= rows
      assert(row.getLong(3) <= row.getLong(2)) // distinct <= filled
      assert(row.getString(4) != null && row.getString(5) != null)
    }
  }

  test("q42 seasonal: every flagged day really exceeds 1.2x its dow baseline") {
    val r = graft.operators.Analytics3.q42Seasonal(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (dow, n, nDays, total, ratio) = (row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getDouble(6))
      assert(5 * n * nDays > 6 * total)
      assert(ratio == (n * nDays).toDouble / total)
      val day = java.time.LocalDate.parse(row.getString(1))
      // dow 0 = Monday by the fixed-epoch mod-7 definition
      assert(dow == (day.getDayOfWeek.getValue - 1).toLong)
    }
  }

  test("zorderKey equals the bit-loop Morton reference on random pairs") {
    val cases = (1 to 200).map { _ =>
      (rnd.nextLong().abs % 4294967296L, rnd.nextLong().abs % 4294967296L)
    }
    val got = cases.toDF("a", "b")
      .select(graft.sources.Compaction.zorderKey($"a", $"b").as("z"))
      .as[Long].collect()
    cases.zip(got).foreach { case ((a, b), z) =>
      assert(z === MortonRef.morton(a, b), s"morton($a, $b)")
    }
  }

  test("p06 mixture resample equals the per-doc weight reference") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").as[(Long, String)].collect()
    val out = operators.Pipeline.p06MixtureResample(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("epoch").as("maxe"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    docs.foreach { case (id, src) =>
      val w100 = 50L + (src.length * 37) % 200
      val h = (id * 2654435761L) % 4294967296L
      val reps = w100 / 100 + (if (h % 100 < w100 % 100) 1L else 0L)
      if (reps == 0) assert(!out.contains(id), s"doc $id should be dropped")
      else assert(out(id) === ((reps, reps)),
        s"doc $id: ${reps} epochs expected (w100=$w100)")
    }
  }

  test("q24 range window equals the naive per-row reference") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val got = operators.Analytics2.q24RangeWindow(spark, sf)
      .select("event_id", "n_1h", "sum_1h")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_EVEN))).toMap
    val byUser = ev.groupBy(_._2)
    ev.foreach { case (eid, uid, us, _) =>
      val frame = byUser(uid).filter(e => e._3 >= us - 3600000000L && e._3 <= us)
      val wantSum = frame.map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)).sum
      assert(got(eid) === ((frame.length.toLong, wantSum)), s"event $eid")
    }
  }

  test("scd2From equals the naive sequential reference on random streams") {
    // ts collisions ON PURPOSE (coarse second grid): the (ts,
    // event_id) tie-break must produce one deterministic history
    val ev = (1 to 400).map { i =>
      (i.toLong, (1 + rnd.nextInt(12)).toLong,
        new Timestamp(rnd.nextInt(50).toLong * 1000),
        s"s${rnd.nextInt(3)}")
    }
    val got = operators.Analytics3.scd2From(
        ev.toDF("event_id", "user_id", "ts", "event_type"))
      .select("user_id", "version", "state", "valid_from", "valid_to")
      .as[(Long, Long, String, Timestamp, Option[Timestamp])]
      .collect().sortBy(r => (r._1, r._2)).toSeq

    val want = ev.groupBy(_._2).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(e => (e._3.getTime, e._1))
      // sequential fold: keep only state changes
      val changes = ordered.foldLeft(Vector.empty[(Timestamp, String)]) {
        case (acc, (_, _, ts, st)) =>
          if (acc.nonEmpty && acc.last._2 == st) acc else acc :+ (ts, st)
      }
      changes.zipWithIndex.map { case ((ts, st), i) =>
        (uid, (i + 1).toLong, st, ts,
          changes.lift(i + 1).map(_._1): Option[Timestamp])
      }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("q31's doubled-median trick is exact for any integer multiset") {
    // the operator's correctness rests on percentile(xs, 0.5) * 2
    // being EXACTLY the integer a+b — check across sizes incl. ties
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(50)
      val xs = Seq.fill(n)((rnd.nextInt(20000) - 10000).toLong)
      val med2 = xs.toDF("x")
        .select((expr("percentile(x, 0.5)") * 2).cast("long")).as[Long].head()
      val s = xs.sorted
      val want = if (n % 2 == 1) s(n / 2) * 2 else s(n / 2 - 1) + s(n / 2)
      assert(med2 === want, s"n=$n")
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

  test("LongArraySum equals the per-slot reference incl. null rows and partial merges") {
    // constructed: null rows skipped, all-null group yields null
    val fixed = Seq(
      (1L, Option(Seq(1L, 2L, 3L))),
      (1L, Option(Seq(10L, -20L, 30L))),
      (1L, Option.empty[Seq[Long]]),
      (2L, Option(Seq(5L, 5L, 5L))),
      (3L, Option.empty[Seq[Long]]))
      .toDF("g", "a")
      .groupBy("g").agg(graft.plans.LongArraySum($"a").as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(fixed(1L) === Some(Seq(11L, -18L, 33L)))
    assert(fixed(2L) === Some(Seq(5L, 5L, 5L)))
    assert(fixed(3L) === None)
    // randomized, many partitions: exercises partial buffers,
    // serialize/deserialize through the exchange, and merge
    val rows = (0 until 500).map(i =>
      ((i % 7).toLong, Seq.fill(64)(rnd.nextLong() % 1000000)))
    val got = rows.toDF("g", "a").repartition(11)
      .groupBy("g").agg(graft.plans.LongArraySum($"a").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (0 until 64).map(i => rs.map(_._2(i)).sum)
    }
    got.foreach { case (g, s) => assert(s === want(g), s"group $g") }
  }

  test("qa04 staleness metrics move when the increment batch drifts") {
    // corpus (vec_id % 10 < 8): members clustered on 4 base
    // directions (dims 0/8/16/24) with a small per-id jitter dim.
    // Control increments (% 10 >= 8) follow the SAME rule; drifted
    // increments all point at dim 63 — a direction no corpus member
    // (hence no frozen centroid) occupies. The monitor must read
    // ~zero skew/drift for the control batch and a clearly worse fit
    // + concentrated occupancy for the drifted one — that separation
    // IS the re-freeze trigger qa04 exists to provide.
    def vec(dir: Int, jitter: Int): Seq[Float] = {
      val a = Array.fill(64)(0.0f)
      a(dir) = 1.0f
      a(32 + jitter % 16) = 0.2f
      a.toSeq
    }
    val ids = (0L until 200L)
    def frame(drifted: Boolean) = ids.map { i =>
      val isInc = i % 10 >= 8
      // drifted: one direction AND one jitter dim — arriving data
      // that both misses every centroid and piles into few cells.
      // base direction cycles on i/4 (NOT i%4) so the bounded-k
      // stride-4 seeds cover all four directions — otherwise every
      // centroid would share one direction and the corpus's own fit
      // would be as poor as the drifted batch's
      val (dir, jit) =
        if (isInc && drifted) (63, 0)
        else (((i / 4) % 4).toInt * 8, i.toInt)
      (i, vec(dir, jit))
    }.toDF("vec_id", "embedding")
    def metrics(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = graft.operators.Dedup.qa04From(df).collect()
      val maxSkew = rows.map(r => math.abs(r.getAs[Double]("occ_skew"))).max
      val minDrift = rows.flatMap(r =>
        Option(r.getAs[java.lang.Double]("fit_drift_micro")).map(_.toDouble))
      (maxSkew, if (minDrift.isEmpty) 0.0 else minDrift.min)
    }
    val (skewCtl, driftCtl) = metrics(frame(drifted = false))
    val (skewDrf, driftDrf) = metrics(frame(drifted = true))
    info(f"control: max|skew|=$skewCtl%.3f minDrift=$driftCtl%.0fµ; " +
      f"drifted: max|skew|=$skewDrf%.3f minDrift=$driftDrf%.0fµ")
    // control increments mirror the corpus: small skew, small drift
    assert(skewCtl < 0.15, f"control occupancy skew too large: $skewCtl%.3f")
    assert(math.abs(driftCtl) < 100000.0,
      f"control fit drift should be near zero: $driftCtl%.0f micro-cos")
    // drifted increments: all mass in few cells, fit clearly worse
    assert(skewDrf > skewCtl + 0.2,
      f"drifted batch must concentrate occupancy: $skewDrf%.3f vs $skewCtl%.3f")
    assert(driftDrf < driftCtl - 100000.0,
      f"drifted batch must fit centroids worse: $driftDrf%.0f vs $driftCtl%.0f micro-cos")
  }

  test("q34 windowed dedup equals the local gap-split reference on random events") {
    val types = Seq("view", "click", "buy")
    // bursty arrivals: small gaps inside bursts, occasional > 10-min
    // jumps, duplicate timestamps to exercise the (ts, id) tie-break
    val events = (1 to 400).map { i =>
      val u = rnd.nextInt(6).toLong
      val t = types(rnd.nextInt(types.size))
      val us = rnd.nextInt(50) * 180L * 1000000L // 0..150 min on a 3-min grid
      (u, t, i.toLong, new Timestamp(us / 1000))
    }
    val got = graft.operators.Analytics3.q34From(
        events.toDF("user_id", "event_type", "event_id", "ts"))
      .select("user_id", "event_type", "win", "keep_event_id", "n_copies", "span_s")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq.sorted

    val gapUs = 600L * 1000000L
    val want = events.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((u, t), es) =>
      val sorted = es.map(e => (e._4.getTime * 1000L, e._3)).sortBy(identity)
      val windows = Seq.newBuilder[Seq[(Long, Long)]]
      var cur = Seq.newBuilder[(Long, Long)]
      var last = sorted.head._1
      sorted.foreach { e =>
        if (e._1 - last > gapUs) { windows += cur.result(); cur = Seq.newBuilder }
        cur += e
        last = e._1
      }
      windows += cur.result()
      windows.result().zipWithIndex.map { case (ws, i) =>
        (u, t, (i + 1).toLong, ws.head._2, ws.size.toLong,
          (ws.last._1 - ws.head._1) / 1000000.0)
      }
    }.sorted
    assert(got == want, "q34 must equal the local gap-split reference")
  }

  test("q40 decayed top-k equals the local integer-weight reference on random events") {
    val types = Seq("view", "click", "buy")
    val events = (1 to 500).map { _ =>
      val u = rnd.nextInt(20).toLong
      val t = types(rnd.nextInt(types.size))
      // ages spread over ~30 weeks so the 20-half-life cap is hit
      val us = rnd.nextInt(30 * 7 * 24) * 3600L * 1000000L
      (t, u, new Timestamp(us / 1000))
    }
    val got = graft.operators.Analytics3.q40From(
        events.toDF("event_type", "user_id", "ts"))
      .select("event_type", "rn", "user_id", "n_events", "score_units")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted

    val weekUs = 7L * 86400L * 1000000L
    val maxUs = events.map(_._3.getTime * 1000L).max
    val scored = events.groupBy(e => (e._1, e._2)).map { case ((t, u), es) =>
      val score = es.map { e =>
        val age = math.min((maxUs - e._3.getTime * 1000L) / weekUs, 20L)
        1L << (20 - age).toInt
      }.sum
      (t, u, es.size.toLong, score)
    }.toSeq
    val want = scored.groupBy(_._1).toSeq.flatMap { case (t, us) =>
      us.sortBy(x => (-x._4, x._2)).take(5).zipWithIndex.map { case (x, i) =>
        (t, (i + 1).toLong, x._2, x._3, x._4)
      }
    }.sorted
    assert(got == want, "q40 must equal the local integer-weight reference")
  }

  test("q45 big orders equals the local threshold reference on random data") {
    // quantities with two decimals so the DECIMAL sum's exactness is
    // exercised where double summation could drift near the threshold
    val li = (1 to 600).map { i =>
      (rnd.nextInt(80).toLong, (rnd.nextInt(5000) + 1) / 100.0, i)
    }
    val ords = (0 until 80).map { k =>
      (k.toLong, (k % 11).toLong, new Timestamp(86400000L * k), 100.0 + k)
    }
    val cust = (0 until 11).map(u => (u.toLong, s"seg${u % 3}"))
    val got = graft.operators.Analytics3.q45From(
        li.toDF("l_orderkey", "l_quantity", "i"),
        ords.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        cust.toDF("c_custkey", "c_mktsegment"))
      .select("o_orderkey", "o_custkey", "c_mktsegment", "sum_qty")
      .as[(Long, Long, String, Double)].collect().toSeq.sorted
    val want = li.groupBy(_._1).toSeq.flatMap { case (ok, ls) =>
      // exact cents sum — the decimal reference
      val cents = ls.map(l => math.round(l._2 * 100)).sum
      if (cents > 25000)
        ords.find(_._1 == ok).map { o =>
          (ok, o._2, s"seg${o._2 % 3}", cents / 100.0)
        }
      else None
    }.sorted
    assert(got == want, "q45 must equal the local threshold reference")
  }

  test("q46 dormant customers equals the local scalar+anti reference on random data") {
    val cust = (0 until 120).map { u =>
      (u.toLong, (u % 7).toLong, (rnd.nextInt(20000) - 5000) / 10.0)
    }
    val ords = (0 until 300).map { i =>
      // ~half the orders are "recent"; customers 0..59 only
      (i.toLong, rnd.nextInt(60).toLong,
        new Timestamp(java.sql.Timestamp.valueOf(
          if (rnd.nextBoolean()) "2001-01-01 00:00:00"
          else "1999-01-01 00:00:00").getTime + rnd.nextInt(1000) * 3600000L))
    }
    val got = graft.operators.Analytics3.q46From(
        cust.toDF("c_custkey", "c_nationkey", "c_acctbal"),
        ords.toDF("o_orderkey", "o_custkey", "o_orderdate"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val cutoff = java.sql.Timestamp.valueOf("2000-01-01 00:00:00").getTime
    val pos = cust.filter(_._3 > 0)
    val avg = pos.map(c => math.round(c._3 * 100)).sum.toDouble / 100.0 / pos.size
    val recent = ords.filter(_._3.getTime >= cutoff).map(_._2).toSet
    val want = cust
      .filter(c => c._3 > avg && !recent.contains(c._1))
      .groupBy(_._2).toSeq.map { case (nk, cs) =>
        (nk, cs.size.toLong, cs.map(c => math.round(c._3 * 100)).sum / 100.0)
      }.sorted
    assert(got == want, "q46 must equal the local scalar+anti reference")
  }

  test("mm12 band-drift signals move when arriving media is novel") {
    // corpus: 50 hashes over a small value family (bands populated);
    // matched arrivals: exact re-uploads of corpus hashes — every
    // band value known, hit_share 1.0, no new buckets. Novel
    // arrivals: a DISJOINT value family (band values the corpus never
    // produced) — zero hits, every bucket new. That separation IS the
    // re-freeze trigger mm12 exists to provide.
    val rnd = new Random(7)
    val corpRows = (0L until 50L).map(i =>
      (i, (rnd.nextInt(1 << 30)).toLong, (rnd.nextInt(1 << 30)).toLong))
    val corp = corpRows.toDF("doc_id", "h_hi", "h_lo")
    val matchedArr = corpRows.take(10).map { case (i, hi, lo) =>
      (i + 1000L, hi, lo) }.toDF("doc_id", "h_hi", "h_lo")
    // novel hashes with bit 31 set: corpus hashes are < 2^30, so
    // their band-0/2 values (h >> 16) stay under 2^14 while novel
    // band-0/2 values are >= 0x8000 — those two bands are GUARANTEED
    // all-new (bands 1/3 are 16-bit masks and may collide by chance;
    // the assertions only rely on the guaranteed bands)
    val novelArr = (0L until 10L).map { i =>
      val v = 0x8000_8000L | (i << 1)
      (i + 2000L, v, v | 1L)
    }.toDF("doc_id", "h_hi", "h_lo")
    def signals(arr: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val rows = graft.operators.Multimodal.mm12From(arr, corp).collect()
      (rows.map(_.getAs[Long]("n_new_buckets")).sum,
        rows.map(_.getAs[Double]("hit_share")).min)
    }
    val (newMatched, hitMatched) = signals(matchedArr)
    assert(newMatched == 0L && hitMatched == 1.0,
      s"re-uploads must read fully covered ($newMatched new, $hitMatched hit)")
    val (newNovel, hitNovel) = signals(novelArr)
    assert(hitNovel < 1.0 && newNovel > 0L,
      s"novel content must trip the monitor ($newNovel new, $hitNovel hit)")
  }

  test("p19 chunk windows equal the local slicing reference on random lengths") {
    // token counts straddling every regime: below the window, exactly
    // the window, one past it, stride-aligned and not
    val docs = (0 until 120).map { i =>
      val n = rnd.nextInt(100) + 1
      (i.toLong, (0 until n).map(t => s"w${i}_$t").mkString(" "))
    }
    val got = graft.operators.Pipeline.p19From(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq.sorted
    val want = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+")
      val n = t.length
      val k = if (n <= 32) 1 else (n - 32 + 23) / 24 + 1
      (0 until k).map { c =>
        val start = c * 24
        val len = math.min(32, n - start)
        (id, c.toLong, k.toLong, start.toLong, len.toLong,
          t.slice(start, start + len).mkString(" "))
      }
    }.sorted
    assert(got == want, "p19 must equal the local slicing reference")
    // the invariants the trainer relies on: every token covered by
    // some chunk, no empty chunk
    want.groupBy(_._1).foreach { case (_, cs) =>
      val n = cs.map(c => c._4 + c._5).max
      assert(cs.flatMap(c => c._4 until (c._4 + c._5)).toSet ==
        (0L until n).toSet)
      assert(cs.forall(_._5 >= 1))
    }
  }

  test("s21 hard negatives equal the local margin reference on the fixture") {
    // local: the same quantize/cos algebra as the operator (shared
    // IEEE op order), positives and negatives ranked per query
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 10000)).toArray))
    def cos(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum.toDouble) *
          math.sqrt(b.map(x => x * x).sum.toDouble))
    val want = e.filter(_._1 % 20 == 0).toSeq.flatMap { case (qid, qlab, qv) =>
      val scored = e.filter(_._1 != qid).toSeq
        .map { case (cid, clab, cv) => (cid, clab, cos(qv, cv)) }
      val (posId, posCos) = scored.filter(_._2 == qlab)
        .map(s => (s._1, s._3)).minBy { case (cid, c) => (-c, cid) }
      scored.filter(_._2 != qlab).sortBy { case (cid, _, c) => (-c, cid) }
        .take(5).zipWithIndex.map { case ((nid, nlab, ncos), i) =>
          (qid, qlab.toLong, (i + 1).toLong, nid, nlab.toLong, ncos,
            posId, posCos, posCos - ncos)
        }
    }.sorted
    val got = graft.operators.Similarity.s21HardNegatives(spark, sf)
      .select(col("q_id"), col("q_label").cast("long"), col("rank"),
        col("neg_id"), col("neg_label").cast("long"), col("neg_cos"),
        col("pos_id"), col("pos_cos"), col("margin"))
      .as[(Long, Long, Long, Long, Long, Double, Long, Double, Double)]
      .collect().toSeq.sorted
    assert(got == want, "s21 must equal the local margin reference")
  }

  test("q51 correlated-avg filter equals the local cents reference on random data") {
    // quantities/prices with two decimals so the cross-multiplied
    // predicate 5·qty·n < Σqty is exercised where float division
    // (qty < 0.2·avg) could flip rows near the boundary
    val li = (1 to 800).map { i =>
      (rnd.nextInt(60).toLong, (rnd.nextInt(5000) + 1) / 100.0,
        (rnd.nextInt(100000) + 1) / 100.0, i)
    }
    val part = (0 until 60).map(p => (p.toLong, s"Brand#${p % 5 + 1}"))
    val got = graft.operators.Analytics4.q51From(
        li.toDF("l_partkey", "l_quantity", "l_extendedprice", "i"),
        part.toDF("p_partkey", "p_brand"))
      .as[(String, Long, Double)].collect().toSeq.sorted
    val brands = part.toMap
    val perPart = li.groupBy(_._1).map { case (pk, ls) =>
      pk -> (ls.size.toLong, ls.map(l => math.round(l._2 * 100)).sum)
    }
    val want = li
      .filter { l =>
        val (n, sq) = perPart(l._1)
        brands(l._1).stripPrefix("Brand#").toInt <= 3 &&
          5 * math.round(l._2 * 100) * n < sq
      }
      .groupBy(l => brands(l._1)).toSeq.map { case (b, ls) =>
        (b, ls.size.toLong, ls.map(l => math.round(l._3 * 100)).sum / 100.0)
      }.sorted
    assert(got == want, "q51 must equal the local cents reference")
  }

  test("q54 max-of-aggregate join-back equals the local reference on random data") {
    // revenue in exact 1e-4 units locally (cents · (100 − disc%)) —
    // the decimal-equality claim: "equals the max" must not miss by
    // an ulp even when several suppliers tie
    val inWin = java.sql.Timestamp.valueOf("1997-02-01 00:00:00")
    val outWin = java.sql.Timestamp.valueOf("1997-06-01 00:00:00")
    val li = (1 to 500).map { i =>
      (rnd.nextInt(12).toLong, (rnd.nextInt(100000) + 1) / 100.0,
        rnd.nextInt(100) / 100.0, if (rnd.nextBoolean()) inWin else outWin, i)
    }
    // force a tie class ABOVE any reachable random total (≤ ~40
    // in-window lines × 1000.00): two suppliers, one identical line
    val tied = Seq((100L, 88888.88, 0.0, inWin, 9001),
      (101L, 88888.88, 0.0, inWin, 9002))
    val all = li ++ tied
    val supp = ((0 until 12) ++ Seq(100, 101)).map(s => (s.toLong, s"supp$s"))
    val got = graft.operators.Analytics4.q54From(
        all.toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate", "i"),
        supp.toDF("s_suppkey", "s_name"))
      .as[(Long, String, Double)].collect().toSeq.sorted
    val rev = all.filter(_._4 == inWin).groupBy(_._1).map { case (sk, ls) =>
      sk -> ls.map(l => math.round(l._2 * 100) * (100 - math.round(l._3 * 100))).sum
    }
    val mx = rev.values.max
    val want = rev.filter(_._2 == mx).keys.toSeq.sorted
      .map(sk => (sk, s"supp$sk", mx / 10000.0))
    assert(got == want, "q54 must equal the local max reference")
  }

  test("q58 global-fraction HAVING equals the local reference on random data") {
    val li = (1 to 700).map { i =>
      (rnd.nextInt(90).toLong, rnd.nextInt(20).toLong,
        (rnd.nextInt(100000) + 1) / 100.0, (rnd.nextInt(5000) + 1) / 100.0, i)
    }
    val supp = (0 until 20).map(s => (s.toLong, (s % 6).toLong))
    val nation = (0 until 6).map(n => (n.toLong, (n % 3).toLong))
    val got = graft.operators.Analytics4.q58From(
        li.toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity", "i"),
        supp.toDF("s_suppkey", "s_nationkey"),
        nation.toDF("n_nationkey", "n_regionkey"))
      .as[(Long, Double)].collect().toSeq.sorted
    val regionSupp = supp.filter(s => nation.toMap.apply(s._2) == 2L).map(_._1).toSet
    val vals = li.filter(l => regionSupp(l._2)).groupBy(_._1).map { case (pk, ls) =>
      pk -> ls.map(l => math.round(l._3 * 100) * math.round(l._4 * 100)).sum
    }
    val tv = vals.values.sum
    val want = vals.filter { case (_, v) => v * 2000 > tv }
      .toSeq.map { case (pk, v) => (pk, v / 10000.0) }.sorted
    assert(got == want, "q58 must equal the local fraction reference")
  }
}
