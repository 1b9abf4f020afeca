package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the part co-purchase graph (parts are nodes;
  * an edge connects two parts that appear in the same order —
  * the market-basket graph q38 treats as pairs, here treated as a
  * graph proper). Complements [[Components]] (connectivity for
  * dedup clusters) with counting-style graph analytics whose outputs
  * are exact integers — fully oracle-checkable cross-engine.
  */
object Graph {

  /** Distinct unordered co-purchase edges (x < y canonical form).
    *
    * Scale shape: the pair fan-out is PER-ORDER (items-per-order²,
    * a small constant in any order-shaped corpus — TPC-H caps at 7
    * lineitems/order), never corpus²; `distinct` is one hash
    * aggregate on the (x, y) key. OpCached: callers branch over the
    * edge frame several times (degrees, orientation), and the
    * corpus-scale-input/bounded-output shape is exactly the cache's
    * admission class. */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    OpCache.cached(orderPairs(
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))))

  /** Distinct canonical (x < y) part pairs sharing an order — THE
    * edge definition, shared by every graph operator, the stress
    * probe and the stream spec so the canonicalization cannot drift
    * between them. Input: (l_orderkey, l_partkey) rows. */
  private[graft] def orderPairs(rows: DataFrame): DataFrame = {
    val a = rows.select(col("l_orderkey"), col("l_partkey").as("x"))
    val b = rows.select(col("l_orderkey"), col("l_partkey").as("y"))
    a.join(b, Seq("l_orderkey")).filter(col("x") < col("y"))
      .select("x", "y").distinct()
  }

  /** g01: exact triangle counting by degree-ordered wedge closure —
    * the scalable MapReduce pattern (orient every edge from its
    * (degree, id)-lower endpoint to its higher one; then each
    * triangle is found exactly once as an out-wedge of its
    * rank-lowest vertex closed by a third oriented edge). The
    * orientation bounds per-node out-degree by O(√edges) regardless
    * of raw degree skew — the hub that touches half the corpus gets
    * a SQRT-bounded out-neighborhood, not its raw degree², which is
    * what bounds both the intersection work and the adjacency row
    * width at 100 TB. Closure order is by RANK (degree, id), not
    * id: pairing wedge endpoints by raw id would silently miss every
    * triangle whose id order disagrees with its degree order
    * (measured at sf0.01: 207,786 of 413,718 triangles lost — half
    * the answer).
    *
    * Output: per-brand triangle participation (each triangle credits
    * its three corners), all exact integers. Plan: three hash
    * groupBys + equi-joins (degree frame is node-scaled, hint-free;
    * the closure probe joins wedge candidates to oriented edges on
    * the composite (v, w) key); part join hint-free (corpus-scaled
    * dimension). */
  def g01Triangles(spark: SparkSession, dir: String): DataFrame = {
    // cache the triangle frame: the per-corner credit union reads it
    // three times, and union branches get no common-subexpression
    // reuse — uncached, the intersection pass would run 3×
    val tri = OpCache.cached(triangles(copurchaseEdges(spark, dir)))
    val perNode = tri.select(col("a").as("n"))
      .unionAll(tri.select(col("b").as("n")))
      .unionAll(tri.select(col("c").as("n")))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    perNode
      .join(Tables.part(spark, dir).select(col("p_partkey").as("n"), col("p_brand")), "n")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"), sum(col("n_tri")).as("tri_slots"))
      .orderBy("p_brand")
  }

  /** Triangles (a, b, c) of an (x < y)-canonical undirected edge
    * frame, each exactly once, corners in rank order. Shared with
    * the spec's brute-force cross-check. */
  def triangles(e: DataFrame): DataFrame = {
    val deg = e.select(col("x").as("n")).unionAll(e.select(col("y").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("n").as("y"), col("d").as("dy")), "y")
    val xLower = col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y"))
    val o = OpCache.cached(withDeg.select(
      when(xLower, col("x")).otherwise(col("y")).as("u"),
      when(xLower, col("y")).otherwise(col("x")).as("v"),
      when(xLower, col("dy")).otherwise(col("dx")).as("dv")))
    // edge-iterator closure: for each oriented edge (a, b), the
    // triangles it roots are out(a) ∩ out(b) — every triangle
    // (a, b, c) in rank order appears at exactly its (a, b) edge
    // (c is an out-neighbor of BOTH only there). Out-neighbor
    // arrays are bounded by the orientation's O(√edges) out-degree
    // cap (sf0.1: max 90), so row width stays bounded and — the
    // decisive cost difference — the only corpus-scale shuffles are
    // the adjacency groupBy and two edge⋈adjacency equi-joins:
    // intersections run in-core and emit exactly the triangle rows.
    // The naive alternative (materialize all (a,b)(a,c) wedge pairs,
    // then semi-join edges to close them) shuffles the Σ outdeg²
    // wedge mass — ~30× the edge count here; measured at sf0.1 it
    // reads 16.5s (sort-merge closure) / 13.0s (shuffled-hash
    // closure) against 4–5s for this plan, and the gap widens with
    // density (see PLANS round-8e)
    val adj = OpCache.cached(
      o.groupBy("u").agg(sort_array(collect_list(col("v"))).as("nbrs")))
    o.select(col("u").as("a"), col("v").as("b"))
      .join(adj.select(col("u").as("a"), col("nbrs").as("na")), "a")
      .join(adj.select(col("u").as("b"), col("nbrs").as("nb")), "b")
      .select(col("a"), col("b"),
        explode(array_intersect(col("na"), col("nb"))).as("c"))
  }

  /** g02: related-items by co-purchase Jaccard — for every part pair
    * sharing ≥2 orders, |orders(x) ∩ orders(y)| / |orders(x) ∪
    * orders(y)|. The recommender classic ("customers who bought
    * x…") with every float ONE division of exact integers
    * (n_xy / (n_x + n_y − n_xy) — numerator and denominator are
    * both plain counts, the q36/q38 rule).
    *
    * Plan: one distinct on (order, part) — a part can repeat within
    * an order as separate lineitems — then per-order pair fan-out
    * (bounded by items-per-order², never corpus²) hash-aggregated on
    * the (x, y) key; per-part order counts are a node-scaled frame
    * joined hint-free. The n_xy ≥ 2 screen bounds output to the
    * genuinely co-bought pairs. */
  /** Distinct (order, part) incidence — a part can repeat within an
    * order as separate lineitems. OpCached: g02 and g03 both branch
    * over it. */
  private def orderParts(spark: SparkSession, dir: String): DataFrame =
    OpCache.cached(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct())

  def g02CopurchaseJaccard(spark: SparkSession, dir: String): DataFrame = {
    val op = orderParts(spark, dir)
    val nPer = op.groupBy("l_partkey").agg(count(lit(1)).as("n_ord"))
    val a = op.select(col("l_orderkey"), col("l_partkey").as("x"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("y"))
    a.join(b, Seq("l_orderkey")).filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= 2)
      .join(nPer.select(col("l_partkey").as("x"), col("n_ord").as("n_x")), "x")
      .join(nPer.select(col("l_partkey").as("y"), col("n_ord").as("n_y")), "y")
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        (col("n_xy").cast("double") / (col("n_x") + col("n_y") - col("n_xy")))
          .as("jaccard"))
      .orderBy("x", "y")
  }

  /** g04: INCREMENTAL triangle counting — the d15/d17/d18
    * frozen-corpus discipline extended to the graph family: the
    * co-purchase graph of already-ingested orders (l_orderkey % 10
    * < 8) is the frozen corpus; edges that only the arriving orders
    * (% 10 ≥ 8) introduce are the increment. Every triangle the
    * increment creates is counted EXACTLY once by how many new
    * edges it contains — the standard incremental accounting:
    *  - 1 new edge (x, y): third vertex adjacent to BOTH ends in
    *    the OLD graph — found from x's old incidence then verified
    *    against the (y, w) old edge; per-new-edge cost
    *    O(deg_old(x)), the increment-scaled cost the family
    *    promises (the corpus wedge space is never rescanned);
    *  - 2 new edges: a new wedge (unique shared vertex) closed by
    *    one old edge;
    *  - 3 new edges: [[triangles]] of the increment edge set alone.
    * The categories are disjoint (new ∩ old = ∅ by the anti-join)
    * and exhaustive, so tri_added ≡ T(old ∪ new) − T(old) — the
    * spec asserts that identity against two full [[triangles]] runs.
    * Output: one exact-integer summary row. */
  def g04IncrementalTriangles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val old = OpCache.cached(corpusEdgeIndex(spark, dir))
    val newE = OpCache.cached(
      orderPairs(li.filter(col("l_orderkey") % 10 >= 8))
        .join(old, Seq("x", "y"), "left_anti"))
    // 1 new edge: w adjacent to both x and y in the old graph —
    // cacheAdj: both join sides of the closure read the corpus
    // adjacency, so the collect_list aggregate runs once per
    // invocation instead of twice per plan (VERDICT r18 #3)
    val c1 = closedByCorpus(newE, old, cacheAdj = true)
      .agg(count(lit(1)).as("tri_1_new"))
    // 2 new edges: a new wedge closed by one old edge
    val newInc = newE.select(col("x").as("u"), col("y").as("w"))
      .unionAll(newE.select(col("y").as("u"), col("x").as("w")))
    val c2 = newInc.as("p").join(newInc.as("q"),
        col("p.u") === col("q.u") && col("p.w") < col("q.w"))
      .select(col("p.w").as("v1"), col("q.w").as("v2"))
      .join(old, col("v1") === col("x") && col("v2") === col("y"), "left_semi")
      .agg(count(lit(1)).as("tri_2_new"))
    // 3 new edges: triangles entirely within the increment
    val c3 = triangles(newE).agg(count(lit(1)).as("tri_3_new"))
    val ne = newE.agg(count(lit(1)).as("n_new_edges"))
    ne.crossJoin(broadcast(c1)).crossJoin(broadcast(c2)).crossJoin(broadcast(c3))
      .select(col("n_new_edges"), col("tri_1_new"), col("tri_2_new"),
        col("tri_3_new"),
        (col("tri_1_new") + col("tri_2_new") + col("tri_3_new")).as("tri_added"))
  }

  /** Triangles an edge frame closes against a frozen corpus edge
    * set: for each (x, y), every w adjacent to BOTH ends in the
    * corpus — g04's 1-new-edge category, and the literal join
    * algebra [[graft.streaming.TriStream]] runs per arriving edge
    * (shared here so the batch operator and the stream cannot
    * drift). Both inputs must be (x < y)-canonical. Cost is
    * O(deg_corpus(x)) per probe edge — the corpus wedge space is
    * never rescanned. */
  private[graft] def closedByCorpus(probe: DataFrame, corpus: DataFrame,
                                    probeBounded: Boolean = false,
                                    cacheAdj: Boolean = false): DataFrame = {
    // ADJACENCY-INTERSECTION closure (r18 opt pass — the g01
    // edge-iterator shape applied to the probe path): the closing
    // w's of probe edge (x, y) are exactly adj(x) ∩ adj(y) over the
    // undirected corpus neighbor arrays, intersected IN-CORE per
    // probe row. The previous wedge-then-semi-join spelling
    // (probe ⋈ incidence on x, then a (least, greatest) semi-join
    // back into the corpus) materialized Σ deg_corpus(x) wedge ROWS
    // through join machinery — measured at sf0.1: 22.8 M wedges to
    // keep 109,795 closures, ~2 μs of hashed-relation probe per
    // wedge ≈ 30–45 CPU-seconds and a 3.4–6.4 s wall in every join
    // strategy; this shape reads 2.1–2.5 s wall / ~8 CPU-s — the
    // same Σ deg element work, but as primitive long compares inside
    // one codegen stage instead of per-row join probes.
    //
    // INPUT CONTRACT (ADVICE r18): corpus edges must be (x < y)-
    // canonical AND DISTINCT — array_intersect deduplicates, so a
    // duplicated corpus (x, y) row would emit its closures once where
    // the wedge spelling emitted them per duplicate. Every caller
    // satisfies it (orderPairs/corpusEdgeIndex end in distinct();
    // GraphIndexStore's UNWEIGHTED families anti-join appends).
    //
    // HUB SKEW (VERDICT r18 #5 / ADVICE r18, measured by
    // graft.HubProbe): a corpus hub's neighbor array is its full
    // undirected degree (no g01 orientation cap here — closure needs
    // ALL common neighbors). Pure intersection COPIES that array into
    // every probe row touching the hub and scans all of it per row —
    // at 10× replication with a 100K-degree synthetic hub, +8.8 ms
    // per hub-touching arrival, 3.8× the flat per-arrival cost. The
    // split below keeps per-probe cost O(min deg): rows whose
    // endpoint degrees are within [[HubRatio]] of each other take the
    // intersect (the cheap uniform case); degree-skewed rows instead
    // EXPLODE the smaller endpoint's array and verify each wedge
    // against the corpus edge set (w ∈ adj(lo) with (w, hi) a
    // canonical corpus edge ⟺ w ∈ adj(lo) ∩ adj(hi) — identical
    // rows, HubProbe cross-checks both corpora against the wedge
    // reference). The hub's array is then never materialized per
    // probe row, and per-arrival cost stays flat under hub growth.
    val inc = corpus.select(col("x").as("u"), col("y").as("w"))
      .unionAll(corpus.select(col("y").as("u"), col("x").as("w")))
    // `cacheAdj` — ONE adjacency aggregate per invocation instead of
    // one per join side (r19 opt pass, VERDICT r18 #3): callers whose
    // plan or lifetime reads adj repeatedly turn it on —
    // g04IncrementalTriangles (both join sides of one plan re-derived
    // the corpus-scale collect_list: the r18 after-plan's two
    // ObjectHashAggregate pairs) and the streaming twin (which
    // re-aggregated the corpus EVERY MICRO-BATCH, ADVICE r18). The
    // one-shot frozen-probe path measurably should NOT cache (r19
    // OptProbe: scanning the materialized array columns back out of
    // the columnar cache costs more than re-running the aggregate
    // once — 1.9–2.0 s vs 1.6–1.9 s wall — and caching flips the
    // second join from an estimate-driven broadcast to a sort-merge
    // over the widened intermediate).
    val adjBare = inc.groupBy("u")
      .agg(sort_array(collect_list(col("w"))).as("nbrs"))
    val adj = if (cacheAdj) OpCache.cached(adjBare) else adjBare
    // Probe-side strategy (ADVICE r18, the r18 hint's scale hazard):
    // broadcast(probe) is legal ONLY where the probe is bounded by
    // contract — the streaming twin's arrival micro-batches. The
    // batch paths (g04/g06/frozen-probe increments) carry a probe
    // that grows LINEARLY with the corpus; an unconditional hint
    // would bypass autoBroadcastJoinThreshold and hit the 8 GB / 512M-
    // row broadcast hard cap at the 100 TB design point — a hard
    // failure where a hint-free plan degrades to a shuffle join. They
    // instead repartition by the join key at the CONF'D shuffle
    // parallelism. The pinned count matters (r19 StageProfile): the
    // probe pipeline ends in orderPairs' distinct exchange, whose
    // 2.4 MB output AQE byte-coalesces to 2 partitions — and the
    // downstream intersect fan-out (Σ deg_corpus(x) array elements
    // out of 2.4 MB of probe rows) then ran on 2 cores, 1.4 s of a
    // 2.8 s wall. A user-specified partition count opts exactly this
    // exchange out of byte-coalescing, so the fan-out stage's
    // parallelism tracks the WORK, not the input bytes. Scale story
    // intact: the count is spark.sql.shuffle.partitions — the knob a
    // deployment already sizes to its cluster (local default = core
    // count via GraftSession), not a constant — and the join strategy
    // stays the engine's estimate-driven choice (adj broadcasts at
    // bench SFs, degrades to the scale-safe shuffle join at 100 TB;
    // no hint bypasses the 8 GB broadcast cap).
    val p = if (probeBounded) broadcast(probe)
      else probe.repartition(
        probe.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("x"))
    // THE SPLIT COMPILES IN ONLY WHEN THE CORPUS HAS A HUB — one
    // narrow degree aggregate collected as a scalar (memoized per
    // corpus plan, the boundedSeeds discipline) reads max vs mean
    // degree; a hub-free corpus (every bench/oracle corpus: max 222
    // vs mean 120 at sf0.1) takes the plain two-join intersect with
    // ZERO added plan cost. An always-on split was measured first
    // and rejected: its two filter branches re-ran the probe
    // pipeline and the corpus aggregates once each (hub-free 10×
    // wall 3.2 → 11.1 s).
    val degBare = inc.groupBy("u").agg(count(lit(1)).as("d"))
    val ds = OpCache.scalarRow(degBare.agg(max(col("d")).as("mx"),
      sum(col("d")).as("sm"), count(lit(1)).as("n")))
    val hubby = !ds.isNullAt(0) &&
      ds.getLong(0) * ds.getLong(2) > HubRatio * ds.getLong(1)
    if (!hubby)
      p.join(adj.select(col("u").as("x"), col("nbrs").as("na")), "x")
        .join(adj.select(col("u").as("y"), col("nbrs").as("nb")), "y")
        .select(col("x"), col("y"),
          explode(array_intersect(col("na"), col("nb"))).as("w"))
    else {
      // degree-skewed corpus: route each probe row by its endpoint
      // degrees. The deg joins are narrow and also drop corpus-unseen
      // endpoints before any array is joined (the inner adj joins did
      // the same). The batch path checkpoints the routed probe so the
      // two filter branches share one probe evaluation (the p29
      // two-phase precedent); the streaming path cannot checkpoint —
      // its branches re-read the micro-batch, which is bounded.
      val deg = if (cacheAdj) OpCache.cached(degBare) else degBare
      val pd0 = p
        .join(deg.select(col("u").as("x"), col("d").as("dx")), "x")
        .join(deg.select(col("u").as("y"), col("d").as("dy")), "y")
      val pd = if (probeBounded) pd0 else pd0.localCheckpoint(false)
      val skewed = col("dx") > lit(HubRatio) * col("dy") ||
        col("dy") > lit(HubRatio) * col("dx")
      val balanced = pd.filter(!skewed)
        .join(adj.select(col("u").as("x"), col("nbrs").as("na")), "x")
        .join(adj.select(col("u").as("y"), col("nbrs").as("nb")), "y")
        .select(col("x"), col("y"),
          explode(array_intersect(col("na"), col("nb"))).as("w"))
      // the residual wedge path reads the RAW incidence (no arrays,
      // no aggregate): wedge rows = Σ deg(lo) over the few skewed
      // probe rows, each verified by membership in the HI side's
      // incidence. The verify set pre-filters the incidence to the
      // skewed rows' hi endpoints (a first-cut semi-join against the
      // whole canonical edge set sort-merged the full corpus: 10×
      // hub wall 10.3 s) — the hi set is hub-count-sized and
      // broadcast, so both corpus passes here are shuffle-free scans
      // and every join among wedge-scale frames is size-decided.
      val sk = pd.filter(skewed)
        .select(col("x"), col("y"),
          when(col("dx") <= col("dy"), col("x")).otherwise(col("y")).as("lo"),
          when(col("dx") <= col("dy"), col("y")).otherwise(col("x")).as("hi"))
      val hiInc = inc.join(broadcast(sk.select(col("hi").as("u")).distinct()),
        "u")
      val viaWedge = sk
        .join(inc.withColumnRenamed("u", "lo"), "lo")
        .join(hiInc.select(col("u").as("hi"), col("w")),
          Seq("hi", "w"), "left_semi")
        .select(col("x"), col("y"), col("w"))
      balanced.unionByName(viaWedge)
    }
  }

  /** Degree-skew crossover for [[closedByCorpus]]'s hub hybrid, used
    * twice: a corpus is HUBBY when its max degree exceeds HubRatio ×
    * its mean, and a probe row then takes the residual wedge path
    * when one endpoint's degree exceeds the other's by the same
    * factor. Derived from the measured machinery ratio, not from any
    * dataset: per ELEMENT, the explode+semi-join path costs ~30× a
    * primitive in-core array compare (r18 OptProbe: 22.8 M wedges ≈
    * 30–45 CPU-s vs the same element mass intersected in ~8 CPU-s
    * down one codegen stage), so iterating the small side wins once
    * the big side is ≳32× wider — and only then. Uniform-degree
    * corpora never cross it. */
  private[graft] val HubRatio = 32L

  /** Frozen co-purchase corpus edges (orders % 10 < 8) — the static
    * side [[graft.streaming.TriStream]] joins against; built once
    * per corpus freeze (the corpusSeedIndex pattern). */
  def corpusEdgeIndex(spark: SparkSession, dir: String): DataFrame =
    orderPairs(Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 10 < 8)
      .select(col("l_orderkey"), col("l_partkey")))

  /** g05: GRAPH DEGREE-DRIFT monitor (VERDICT r12 #6) — the
    * WHEN-to-refreeze signal for the frozen edge index, completing
    * the monitor lattice (qa04 dense / mm12 media / t20 sparse /
    * THIS graph): arriving edges concentrating on few corpus nodes
    * (occupancy skew toward high-degree bands) is exactly the signal
    * that the frozen adjacency no longer spreads arriving work — the
    * per-probe O(deg_corpus(x)) cost contract of
    * [[closedByCorpus]]/g04 degrades on hot nodes; and edges landing
    * on UNSEEN nodes (band −1) cannot close 1-new-edge triangles
    * against the corpus at all (the media band-miss / t20
    * unseen-vocabulary analog). Corpus/increment split is g04's
    * (orders %10 <8 vs ≥8, increment anti-joined).
    *
    * Output: one row per corpus-degree band (d_old div 8; −1 =
    * unseen), with exact node/endpoint counts, each share/mean ONE
    * division of exact integers, skew/drift a difference of two such
    * divisions (the qa04 float discipline). */
  def g05DegreeDrift(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val old = OpCache.cached(corpusEdgeIndex(spark, dir))
    // cached like g04's increment: the incidence unionAll reads newE
    // from BOTH endpoint branches and union branches get no
    // common-subexpression reuse — uncached, the pair fan-out +
    // anti-join pipeline would run twice (plan-audited round 13)
    val newE = OpCache.cached(
      orderPairs(li.filter(col("l_orderkey") % 10 >= 8))
        .join(old, Seq("x", "y"), "left_anti"))
    degreeDriftBands(old, newE)
  }

  /** g06: FROZEN-PROBE closures as a full-oracle key (the s22 rule
    * applied to the graph family — the frozen read path gated by
    * hash, not just spec-pinned): freeze the corpus edge set into
    * [[graft.sources.GraphIndexStore]] and probe the arriving
    * orders' increment edges against the SHIPPED bucketed table —
    * the literal [[closedByCorpus]] algebra, so rows equal g04's
    * 1-new-edge category enumerated (x, y, w) instead of counted.
    * The key runs freeze→probe (the driver's Verify starts fresh);
    * the bench's g04_frozen_probe entry times the probe alone. */
  def g06FrozenClosures(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.GraphIndexStore.freeze(
      corpusEdgeIndex(spark, dir), "g06_frozen")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val inc = orderPairs(li.filter(col("l_orderkey") % 10 >= 8))
      .join(graft.sources.GraphIndexStore.edges(spark, "g06_frozen"),
        Seq("x", "y"), "left_anti")
    graft.sources.GraphIndexStore.closedFrozen(spark, inc, "g06_frozen")
      .orderBy("x", "y", "w")
  }

  /** The banded degree-drift frame — ONE definition for the live g05
    * key and the frozen edge index's staleness read
    * ([[graft.sources.GraphIndexStore.staleness]] — same algebra over
    * the persisted edges), so the monitor cannot drift between the
    * live and frozen paths. Inputs are (x < y)-canonical edge frames.
    *
    * Scale shape: two node-scaled degree aggregates (map-side
    * combinable), one hint-free full-outer join on the node key, a
    * bounded-band groupBy, a 1-row totals broadcast — no window, no
    * corpus² anywhere; cost class O(edges), the same as the probes it
    * monitors. */
  private[graft] def degreeDriftBands(old: DataFrame,
                                      newE: DataFrame): DataFrame = {
    def inc(e: DataFrame) =
      e.select(col("x").as("u")).unionAll(e.select(col("y").as("u")))
    val dOld = inc(old).groupBy("u").agg(count(lit(1)).as("d_old"))
    val dNew = inc(newE).groupBy("u").agg(count(lit(1)).as("d_new"))
    val banded = dOld.join(dNew, Seq("u"), "full_outer")
      .select(
        when(col("d_old").isNull, lit(-1L))
          .otherwise(expr("d_old div 8")).as("band"),
        coalesce(col("d_old"), lit(0L)).as("d_old"),
        coalesce(col("d_new"), lit(0L)).as("d_new"))
    val perBand = banded.groupBy("band").agg(
      sum(when(col("d_old") > 0, 1L).otherwise(0L)).as("n_nodes_corp"),
      sum(col("d_old")).as("n_end_corp"),
      sum(when(col("d_new") > 0, 1L).otherwise(0L)).as("n_nodes_new"),
      sum(col("d_new")).as("n_end_new"))
    val totals = perBand.agg(sum(col("n_end_corp")).as("tot_corp"),
      sum(col("n_end_new")).as("tot_new"))
    perBand.crossJoin(broadcast(totals))
      .select(col("band"), col("n_nodes_corp"), col("n_end_corp"),
        col("n_nodes_new"), col("n_end_new"),
        (col("n_end_corp").cast("double") / col("tot_corp")).as("corp_share"),
        (col("n_end_new").cast("double") / col("tot_new")).as("new_share"))
      .withColumn("occ_skew", col("new_share") - col("corp_share"))
      .withColumn("corp_mean_deg",
        when(col("n_nodes_corp") > 0,
          col("n_end_corp").cast("double") / col("n_nodes_corp")))
      .withColumn("new_mean_deg",
        when(col("n_nodes_new") > 0,
          col("n_end_new").cast("double") / col("n_nodes_new")))
      .withColumn("deg_drift",
        when(col("n_nodes_corp") > 0 && col("n_nodes_new") > 0,
          col("n_end_new").cast("double") / col("n_nodes_new") -
            col("n_end_corp").cast("double") / col("n_nodes_corp")))
      .orderBy("band")
  }

  /** Damped-iteration count shared between the Column loop and the
    * generated oracle CTEs (the t19 rule: one constant, two engines). */
  private[graft] val PageRankIters = 4

  /** g03: weighted PageRank over the co-purchase graph — node
    * importance under the same damped fixed point as t19's TextRank
    * (4 rounds of r' = 0.15 + 0.85·Σ w/W·r in exact integer
    * micro-units: per-edge contribution r·w div W, damping ·85 div
    * 100 — iterative float summation can never split the engines).
    * The STRUCTURAL difference from t19, and the reason this is a
    * separate operator: token vocabularies are bounded, so t19
    * broadcasts its rank vector each round; the part graph grows
    * WITH the corpus, so here the rank vector joins HINT-FREE (rank
    * is node-scaled — broadcasting it at 100 TB would ship a
    * corpus-sized frame to every executor). Edge frame built once
    * (OpCache), each round = one equi-join + one hash agg. */
  def g03Pagerank(spark: SparkSession, dir: String): DataFrame = {
    val op = orderParts(spark, dir) // OpCache-shared with g02
    val a = op.select(col("l_orderkey"), col("l_partkey").as("x"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("y"))
    // cache the one-direction aggregate: the undirected union reads
    // it twice (no cross-branch reuse), and each PageRank iteration
    // then reads the cached union
    val cw = OpCache.cached(
      a.join(b, Seq("l_orderkey")).filter(col("x") < col("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("w")))
    pagerankFrom(cw)
      .orderBy(col("rank_micro").desc, col("part"))
  }

  /** The damped integer fixed point over a canonical weighted edge
    * frame (x, y, w) — ONE definition for g03 (live corpus build)
    * and g07's re-rank over the frozen∪appended merge, so the rank
    * algebra cannot drift between the from-scratch and incremental
    * paths. Returns (part, n_nbrs, wt, rank_micro), unordered. */
  private[graft] def pagerankFrom(cw: DataFrame): DataFrame = {
    val e = OpCache.cached(
      cw.select(col("x").as("u"), col("y").as("v"), col("w"))
        .unionAll(cw.select(col("y").as("u"), col("x").as("v"), col("w"))))
    val wu = OpCache.cached(
      e.groupBy("u").agg(sum(col("w")).as("wt"), count(lit(1)).as("n_nbrs")))
    // the iteration operand is cached PRE-JOINED (r18 opt pass): every
    // rank round scans ew once, and without this cache each round's
    // map stage re-ran the e ⋈ wu broadcast join — 4 redundant join
    // evaluations of an invocation-invariant frame per chain
    val ew = OpCache.cached(e.join(wu.select("u", "wt"), "u"))
    var r = wu.select(col("u").as("part"), lit(1000000L).as("r"))
    for (_ <- 1 to PageRankIters) {
      r = ew.join(r.withColumnRenamed("part", "u"), "u")
        .select(col("v"), expr("(r * w) div wt").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
        .select(col("v").as("part"),
          (lit(150000L) + expr("(s * 85) div 100")).as("r"))
    }
    r.join(wu.select(col("u").as("part"), col("wt"), col("n_nbrs")), "part")
      .select(col("part"), col("n_nbrs"), col("wt"), col("r").as("rank_micro"))
  }

  /** The weighted corpus edge frame (orders %10 < 8 — g04's frozen
    * slice) — what g07 freezes: co-purchase weight = number of
    * corpus orders sharing the pair. ONE definition for the key, the
    * bench prepare and the ship spec. */
  private[graft] def corpusWeightedEdges(spark: SparkSession,
                                         dir: String): DataFrame =
    weightedPairs(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .filter(col("l_orderkey") % 10 < 8))

  /** Weighted canonical pairs of an (l_orderkey, l_partkey) slice:
    * distinct per order first (a part can repeat within an order),
    * then weight = co-occurring order count. */
  private[graft] def weightedPairs(rows: DataFrame): DataFrame = {
    val op = rows.distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("x"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("y"))
    a.join(b, Seq("l_orderkey")).filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("w"))
  }

  /** g07: INCREMENTAL PAGERANK ON THE FROZEN GRAPH (VERDICT r13 #6 —
    * the one graph operator without an incremental story): the
    * freeze→append→re-derive loop the other three families already
    * run (d15 dense / mm11 media / p22 sparse text), closed for the
    * rank frame. The weighted corpus edges (orders %10 < 8) FREEZE
    * into [[graft.sources.GraphIndexStore]] — carrying `w`, the
    * store's weighted form; arriving orders (%10 ≥ 8) contribute
    * only their own weighted pairs, MERGED with the persisted
    * weights by one (x, y) hash aggregate (order slices are disjoint
    * by the %10 split, so weights add — never a corpus re-scan); the
    * damped fixed point re-derives over the merge through the ONE
    * [[pagerankFrom]] definition. Output joins the re-derived rank
    * against the frozen-corpus rank (both chains in exact integer
    * micro-units) so the key IS the drift view: rank_new,
    * rank_frozen (null for parts the corpus never saw), and their
    * exact delta — what a deployment reads to decide whether the
    * append moved the ranking enough to re-ship downstream
    * consumers.
    *
    * The key runs freeze→merge→re-rank (the driver's Verify starts
    * fresh — the g06 rule); the bench's g07_rerank_phase entry times
    * the read path alone (arrival aggregate + merge + ONE rank
    * chain) with the freeze amortized out. */
  def g07IncrementalPagerank(spark: SparkSession, dir: String): DataFrame = {
    val name = "g07_frozen"
    graft.sources.GraphIndexStore.freeze(
      corpusWeightedEdges(spark, dir), name)
    val frozen = OpCache.cached(
      graft.sources.GraphIndexStore.edges(spark, name))
    val rNew = pagerankFrom(mergedWeights(spark, dir, frozen))
    // (x, y)-aggregate before ranking (ADVICE r14): the store's
    // append contract allows weighted multi-batch families where
    // duplicate (x, y) rows must SUM — and split weights change the
    // integer-division rank chain (a//c + b//c != (a+b)//c). The
    // freeze above is single-batch today, so the aggregate is an
    // identity there, but the reader now honors the documented
    // weighted-reader rule for any accumulated family.
    val rOld = pagerankFrom(
      frozen.groupBy("x", "y").agg(sum(col("w")).as("w")))
      .select(col("part"), col("rank_micro").as("rank_frozen"))
    rNew.join(rOld, Seq("part"), "left")
      .select(col("part"), col("n_nbrs"), col("wt"),
        col("rank_micro").as("rank_new"), col("rank_frozen"),
        (col("rank_micro") - col("rank_frozen")).as("delta_micro"))
      .orderBy(col("rank_new").desc, col("part"))
  }

  /** g07's READ PATH over an already-shipped weighted edge index —
    * what a deployment repeats per append cycle (the bench's
    * g07_rerank_phase entry; the freeze ran once, untimed): arrival
    * weighted pairs + the (x, y) merge aggregate + ONE damped rank
    * chain over the merge. */
  private[graft] def rerankFrozen(spark: SparkSession, dir: String,
                                  name: String): DataFrame =
    pagerankFrom(mergedWeights(spark, dir,
      graft.sources.GraphIndexStore.edges(spark, name)))

  /** The arrival-merge step of g07 — arrival weighted pairs (orders
    * %10 ≥ 8) summed into the frozen weights on the (x, y) key.
    * O(arrivals) new work + one hash aggregate over frozen∪arrival
    * edge rows; shared by the key and the bench read-path entry. */
  private[graft] def mergedWeights(spark: SparkSession, dir: String,
                                   frozen: DataFrame): DataFrame = {
    val arr = weightedPairs(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .filter(col("l_orderkey") % 10 >= 8))
    OpCache.cached(frozen.select("x", "y", "w").unionByName(arr)
      .groupBy("x", "y").agg(sum(col("w")).as("w")))
  }

  /** g08's edge screen: a pair must share ≥ this many orders to be a
    * community edge (weight-1 pairs are co-purchase noise — the g02
    * n_xy ≥ 2 rule; one constant, two engines). */
  private[graft] val CommunityMinWeight = 2L

  /** g08: COMMUNITIES over the weighted co-purchase graph (VERDICT
    * r14 #2 — the graph family counts triangles and ranks nodes but
    * never PARTITIONS the graph): connected components of the
    * weight-≥2 subgraph (genuinely co-bought pairs, g02's screen),
    * each community reported with exact counting outputs — size,
    * internal edge count, edge mass (Σw), brand diversity and the
    * dominant brand (argmax by part count, smallest brand on ties —
    * one min(struct) agg, no window over the corpus). The community
    * id is the component's minimum part key — deterministic in any
    * engine, so the whole frame is oracle-checkable (DuckDB re-labels
    * via a recursive min-reachable CTE).
    *
    * Plan shape (100 TB): the edge build is the per-order-bounded
    * pair fan-out + one (x, y) hash agg ([[weightedPairs]]); labels
    * come from [[Components.starContraction]] — O(log n) alternating
    * contraction rounds REGARDLESS of component diameter (the
    * Kiveris SoCC'14 algorithm the dedup family already runs), each
    * round two equi-join + groupBy passes over the (sparse,
    * weight-screened) edge set, only a per-round Boolean on the
    * driver. Everything after labeling is node-scaled: two hash
    * aggregates + one hint-free part-dimension join. The oracle's
    * transitive-closure recursion is the TEST-GATE shape only — the
    * engine side never materializes reachability. */
  def g08Communities(spark: SparkSession, dir: String): DataFrame =
    communitiesFrom(
      weightedPairs(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")))
        .filter(col("w") >= CommunityMinWeight),
      Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))

  /** g08's core over any canonical weighted edge frame (x, y, w) and
    * a (p_partkey, p_brand) dimension — ComponentsSpec drives it with
    * constructed graphs and pins the disjoint-replica invariant
    * (communities of 10 disjoint offset copies = 10× the rows, labels
    * shifted). */
  private[graft] def communitiesFrom(edges: DataFrame,
                                     parts: DataFrame): DataFrame = {
    val e = OpCache.cached(edges)
    val labels = OpCache.cached(Components.starContraction(
      e.select(col("x").as("doc_a"), col("y").as("doc_b"))))
    // every edge's endpoints share a component, so ONE endpoint join
    // labels the edge
    val em = e.join(labels.select(col("node").as("x"),
        col("label").as("community")), "x")
      .groupBy("community")
      .agg(count(lit(1)).as("n_edges"), sum(col("w")).as("edge_mass"))
    val pb = labels
      .join(parts.select(col("p_partkey").as("node"), col("p_brand")), "node")
      .groupBy(col("label").as("community"), col("p_brand"))
      .agg(count(lit(1)).as("n_b"))
    val brands = pb.groupBy("community")
      .agg(sum(col("n_b")).as("n_parts"), count(lit(1)).as("n_brands"),
        min(struct((lit(0L) - col("n_b")).as("nc"), col("p_brand").as("b")))
          .as("m"))
      .select(col("community"), col("n_parts"), col("n_brands"),
        col("m.b").as("top_brand"), (lit(0L) - col("m.nc")).as("top_brand_parts"))
    brands.join(em, "community")
      .select(col("community"), col("n_parts"), col("n_edges"),
        col("edge_mass"), col("n_brands"), col("top_brand"),
        col("top_brand_parts"))
      .orderBy("community")
  }

  /** g09: COMMUNITY-BRIDGE monitor (round 15 — g08's
    * WHEN-to-refreeze signal, completing the new key's lifecycle the
    * way g05 does for the edge index): how much would the arriving
    * orders' co-purchase edges RESHAPE the frozen communities? The
    * corpus slice (orders %10 < 8, the g04 freeze discipline) labels
    * through the ONE g08 contraction; every arrival pair (%10 ≥ 8)
    * classifies by its endpoints' frozen labels —
    *  - `intra`:  both ends in ONE community (no structural change);
    *  - `bridge`: ends in TWO communities (a refreeze MERGES them —
    *    the signal that invalidates downstream per-community
    *    artifacts);
    *  - `attach`: one end unseen (community grows);
    *  - `novel`:  both ends unseen (new structure forming outside
    *    the frozen view — the g05 band −1 analog).
    * Output per kind: exact edge/weight masses and the distinct
    * label-pair count (for `bridge`, the number of distinct merge
    * events — the refreeze's blast radius). A deployment trips a
    * re-freeze on bridge mass, not on raw arrival volume.
    *
    * Plan shape: labels are node-scaled (the g08 contraction over
    * the weight-screened corpus slice); arrivals join them twice
    * hint-free (label frame grows with the corpus — the g03 rank
    * rule) and ONE bounded groupBy (≤4 rows) emits the monitor.
    * Never a corpus re-scan per arrival batch. */
  def g09CommunityBridges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    // cached BEFORE the contraction (round-15 review fix): its two
    // eager localCheckpoints (nodes + edges) would otherwise run the
    // per-order pair fan-out twice
    val corpusEdges = OpCache.cached(
      weightedPairs(li.filter(col("l_orderkey") % 10 < 8))
        .filter(col("w") >= CommunityMinWeight))
    val labels = OpCache.cached(Components.starContraction(
      corpusEdges.select(col("x").as("doc_a"), col("y").as("doc_b"))))
    val arr = weightedPairs(li.filter(col("l_orderkey") % 10 >= 8))
    bridgeBands(arr, labels).orderBy("kind")
  }

  /** The g09 classify-and-band aggregate over any arrival (x, y, w)
    * frame and a (node, label) frame — ONE definition for the live
    * key, the frozen community index's staleness read
    * ([[graft.sources.GraphIndexStore.communityBridges]] — same
    * algebra over the persisted labels) and its streaming twin, so
    * the monitor cannot drift between the three paths. */
  private[graft] def bridgeBands(arr: DataFrame,
                                 labels: DataFrame): DataFrame = {
    val j = arr
      .join(labels.select(col("node").as("x"), col("label").as("la")),
        Seq("x"), "left")
      .join(labels.select(col("node").as("y"), col("label").as("lb")),
        Seq("y"), "left")
    // explicit CASE orientation (no engine-specific null handling in
    // least/greatest): lo/hi are the sorted label pair, −1 = unseen
    val lo = when(col("la").isNull, col("lb"))
      .when(col("lb").isNull, col("la"))
      .when(col("la") <= col("lb"), col("la")).otherwise(col("lb"))
    val hi = when(col("la").isNull, col("lb"))
      .when(col("lb").isNull, col("la"))
      .when(col("la") <= col("lb"), col("lb")).otherwise(col("la"))
    j.select(
        when(col("la").isNotNull && col("lb").isNotNull &&
          col("la") === col("lb"), "intra")
          .when(col("la").isNotNull && col("lb").isNotNull, "bridge")
          .when(col("la").isNotNull || col("lb").isNotNull, "attach")
          .otherwise("novel").as("kind"),
        col("w"),
        coalesce(lo, lit(-1L)).as("cla"),
        coalesce(hi, lit(-1L)).as("clb"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_edges"), sum(col("w")).as("w_mass"),
        countDistinct(col("cla"), col("clb")).as("n_label_pairs"))
  }

  /** The g03 iteration chain with a NAME SUFFIX, generated from the
    * same [[PageRankIters]] constant — g07 unrolls TWO of these (one
    * over the frozen corpus weights, one over the merge), so both
    * engines execute the same integer steps twice. */
  private def rankChainCtes(sfx: String): String =
    (1 to PageRankIters).map { i =>
      s"""c$i$sfx AS (SELECT e$sfx.v AS part, CAST(SUM((r${i - 1}$sfx.r * e$sfx.w) // wu$sfx.wt) AS BIGINT) AS s
         |  FROM e$sfx JOIN wu$sfx ON e$sfx.u = wu$sfx.u JOIN r${i - 1}$sfx ON r${i - 1}$sfx.part = e$sfx.u GROUP BY e$sfx.v),
         |r$i$sfx AS (SELECT part, 150000 + (s * 85) // 100 AS r FROM c$i$sfx)""".stripMargin
    }.mkString(",\n")

  private def rankChainHead(sfx: String): String =
    s"""e$sfx AS (SELECT x AS u, y AS v, w FROM cw$sfx UNION ALL SELECT y, x, w FROM cw$sfx),
       |wu$sfx AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wt, COUNT(*) AS n_nbrs FROM e$sfx GROUP BY u),
       |r0$sfx AS (SELECT u AS part, CAST(1000000 AS BIGINT) AS r FROM wu$sfx)""".stripMargin

  val oracles: Map[String, String] = Map(
    // components via a RECURSIVE reachability CTE + min label — the
    // oracle may materialize closure pairs (test-SF-bounded; the
    // engine side never does, see g08Communities scaladoc)
    "g08_communities" ->
      s"""WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS x, b.l_partkey AS y, CAST(COUNT(*) AS BIGINT) AS w
        |      FROM op a JOIN op b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= $CommunityMinWeight),
        |sym AS (SELECT x AS u, y AS v FROM e UNION ALL SELECT y, x FROM e),
        |reach(n, m) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym) nn
        |  UNION
        |  SELECT r.n, s.v FROM reach r JOIN sym s ON s.u = r.m),
        |lbl AS (SELECT n, CAST(MIN(m) AS BIGINT) AS community FROM reach GROUP BY n),
        |em AS (SELECT community, COUNT(*) AS n_edges, CAST(SUM(w) AS BIGINT) AS edge_mass
        |       FROM e JOIN lbl ON lbl.n = e.x GROUP BY 1),
        |pb AS (SELECT community, p_brand, COUNT(*) AS n_b
        |       FROM lbl JOIN part ON p_partkey = n GROUP BY 1, 2),
        |tb AS (SELECT community, p_brand AS top_brand, n_b AS top_brand_parts
        |       FROM (SELECT *, row_number() OVER (PARTITION BY community
        |               ORDER BY n_b DESC, p_brand) AS rn FROM pb) z
        |       WHERE rn = 1),
        |sz AS (SELECT community, CAST(SUM(n_b) AS BIGINT) AS n_parts,
        |         COUNT(*) AS n_brands FROM pb GROUP BY 1)
        |SELECT community, n_parts, n_edges, edge_mass, n_brands,
        |  top_brand, top_brand_parts
        |FROM sz JOIN em USING (community) JOIN tb USING (community)
        |ORDER BY community""".stripMargin,

    "g09_community_bridges" ->
      s"""WITH RECURSIVE li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |opo AS (SELECT DISTINCT l_orderkey, l_partkey FROM li WHERE l_orderkey % 10 < 8),
        |e AS (SELECT a.l_partkey AS x, b.l_partkey AS y, CAST(COUNT(*) AS BIGINT) AS w
        |      FROM opo a JOIN opo b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= $CommunityMinWeight),
        |sym AS (SELECT x AS u, y AS v FROM e UNION ALL SELECT y, x FROM e),
        |reach(n, m) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym) nn
        |  UNION
        |  SELECT r.n, s.v FROM reach r JOIN sym s ON s.u = r.m),
        |lbl AS (SELECT n, CAST(MIN(m) AS BIGINT) AS community FROM reach GROUP BY n),
        |opn AS (SELECT DISTINCT l_orderkey, l_partkey FROM li WHERE l_orderkey % 10 >= 8),
        |arr AS (SELECT a.l_partkey AS x, b.l_partkey AS y, CAST(COUNT(*) AS BIGINT) AS w
        |        FROM opn a JOIN opn b
        |          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |        GROUP BY 1, 2),
        |jj AS (SELECT arr.w, lx.community AS la, ly.community AS lb
        |       FROM arr LEFT JOIN lbl lx ON lx.n = arr.x
        |                LEFT JOIN lbl ly ON ly.n = arr.y),
        |cl AS (SELECT w,
        |        CASE WHEN la IS NOT NULL AND lb IS NOT NULL AND la = lb THEN 'intra'
        |             WHEN la IS NOT NULL AND lb IS NOT NULL THEN 'bridge'
        |             WHEN la IS NOT NULL OR lb IS NOT NULL THEN 'attach'
        |             ELSE 'novel' END AS kind,
        |        COALESCE(CASE WHEN la IS NULL THEN lb WHEN lb IS NULL THEN la
        |                      WHEN la <= lb THEN la ELSE lb END, -1) AS cla,
        |        COALESCE(CASE WHEN la IS NULL THEN lb WHEN lb IS NULL THEN la
        |                      WHEN la <= lb THEN lb ELSE la END, -1) AS clb
        |       FROM jj)
        |SELECT kind, COUNT(*) AS n_edges, CAST(SUM(w) AS BIGINT) AS w_mass,
        |  COUNT(DISTINCT (cla, clb)) AS n_label_pairs
        |FROM cl GROUP BY kind ORDER BY kind""".stripMargin,

    "g07_incremental_pagerank" ->
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |opo AS (SELECT DISTINCT l_orderkey, l_partkey FROM li WHERE l_orderkey % 10 < 8),
        |cwo AS (SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS w
        |        FROM opo a JOIN opo b
        |          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |        GROUP BY 1, 2),
        |opn AS (SELECT DISTINCT l_orderkey, l_partkey FROM li WHERE l_orderkey % 10 >= 8),
        |cwn AS (SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS w
        |        FROM opn a JOIN opn b
        |          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |        GROUP BY 1, 2),
        |cwm AS (SELECT x, y, CAST(SUM(w) AS BIGINT) AS w FROM
        |        (SELECT x, y, w FROM cwo UNION ALL SELECT x, y, w FROM cwn) u0
        |        GROUP BY 1, 2),
        |${rankChainHead("o")},
        |${rankChainCtes("o")},
        |${rankChainHead("m")},
        |${rankChainCtes("m")}
        |SELECT rm.part, wum.n_nbrs, wum.wt, rm.r AS rank_new,
        |  ro.r AS rank_frozen, rm.r - ro.r AS delta_micro
        |FROM r${PageRankIters}m rm
        |JOIN wum ON wum.u = rm.part
        |LEFT JOIN r${PageRankIters}o ro ON ro.part = rm.part
        |ORDER BY rank_new DESC, rm.part""".stripMargin,

    // g04's c1 category ENUMERATED: same oldp/newe/oldinc CTEs, rows
    // instead of a count (the frozen probe serves exactly these)
    "g06_frozen_closures" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |oldp AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |         WHERE a.l_orderkey % 10 < 8),
        |newp0 AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |         WHERE a.l_orderkey % 10 >= 8),
        |newe AS (SELECT x, y FROM newp0 WHERE NOT EXISTS
        |         (SELECT 1 FROM oldp o WHERE o.x = newp0.x AND o.y = newp0.y)),
        |oldinc AS (SELECT x AS u, y AS w FROM oldp UNION ALL SELECT y, x FROM oldp)
        |SELECT t.x, t.y, t.w FROM
        |  (SELECT ne.x, ne.y, oi.w FROM newe ne JOIN oldinc oi ON oi.u = ne.x) t
        |WHERE EXISTS (SELECT 1 FROM oldp o
        |  WHERE o.x = least(t.y, t.w) AND o.y = greatest(t.y, t.w))
        |ORDER BY x, y, w""".stripMargin,

    "g05_degree_drift" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |oldp AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |         WHERE a.l_orderkey % 10 < 8),
        |newp0 AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |         WHERE a.l_orderkey % 10 >= 8),
        |newe AS (SELECT x, y FROM newp0 WHERE NOT EXISTS
        |         (SELECT 1 FROM oldp o WHERE o.x = newp0.x AND o.y = newp0.y)),
        |dold AS (SELECT u, COUNT(*) AS d_old FROM
        |  (SELECT x AS u FROM oldp UNION ALL SELECT y FROM oldp) GROUP BY 1),
        |dnew AS (SELECT u, COUNT(*) AS d_new FROM
        |  (SELECT x AS u FROM newe UNION ALL SELECT y FROM newe) GROUP BY 1),
        |j AS (SELECT CASE WHEN d_old IS NULL THEN CAST(-1 AS BIGINT)
        |        ELSE d_old // 8 END AS band,
        |        COALESCE(d_old, 0) AS d_old, COALESCE(d_new, 0) AS d_new
        |      FROM dold FULL OUTER JOIN dnew USING (u)),
        |pb AS (SELECT band,
        |        CAST(SUM(CASE WHEN d_old > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodes_corp,
        |        CAST(SUM(d_old) AS BIGINT) AS n_end_corp,
        |        CAST(SUM(CASE WHEN d_new > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodes_new,
        |        CAST(SUM(d_new) AS BIGINT) AS n_end_new
        |      FROM j GROUP BY band),
        |tot AS (SELECT CAST(SUM(n_end_corp) AS BIGINT) AS tot_corp,
        |        CAST(SUM(n_end_new) AS BIGINT) AS tot_new FROM pb)
        |SELECT band, n_nodes_corp, n_end_corp, n_nodes_new, n_end_new,
        |  CAST(n_end_corp AS DOUBLE) / tot_corp AS corp_share,
        |  CAST(n_end_new AS DOUBLE) / tot_new AS new_share,
        |  CAST(n_end_new AS DOUBLE) / tot_new - CAST(n_end_corp AS DOUBLE) / tot_corp AS occ_skew,
        |  CASE WHEN n_nodes_corp > 0 THEN CAST(n_end_corp AS DOUBLE) / n_nodes_corp END AS corp_mean_deg,
        |  CASE WHEN n_nodes_new > 0 THEN CAST(n_end_new AS DOUBLE) / n_nodes_new END AS new_mean_deg,
        |  CASE WHEN n_nodes_corp > 0 AND n_nodes_new > 0
        |    THEN CAST(n_end_new AS DOUBLE) / n_nodes_new - CAST(n_end_corp AS DOUBLE) / n_nodes_corp
        |  END AS deg_drift
        |FROM pb CROSS JOIN tot ORDER BY band""".stripMargin,

    "g04_incremental_triangles" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |oldp AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |         WHERE a.l_orderkey % 10 < 8),
        |newp0 AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |         WHERE a.l_orderkey % 10 >= 8),
        |newe AS (SELECT x, y FROM newp0 WHERE NOT EXISTS
        |         (SELECT 1 FROM oldp o WHERE o.x = newp0.x AND o.y = newp0.y)),
        |oldinc AS (SELECT x AS u, y AS w FROM oldp UNION ALL SELECT y, x FROM oldp),
        |c1 AS (SELECT COUNT(*) AS n FROM
        |  (SELECT ne.x, ne.y, oi.w FROM newe ne JOIN oldinc oi ON oi.u = ne.x) t
        |  WHERE EXISTS (SELECT 1 FROM oldp o
        |    WHERE o.x = least(t.y, t.w) AND o.y = greatest(t.y, t.w))),
        |newinc AS (SELECT x AS u, y AS w FROM newe UNION ALL SELECT y, x FROM newe),
        |c2 AS (SELECT COUNT(*) AS n FROM newinc p JOIN newinc q ON p.u = q.u AND p.w < q.w
        |       WHERE EXISTS (SELECT 1 FROM oldp o WHERE o.x = p.w AND o.y = q.w)),
        |c3 AS (SELECT COUNT(*) AS n FROM newe e1 JOIN newe e2 ON e2.x = e1.y
        |       JOIN newe e3 ON e3.x = e1.x AND e3.y = e2.y),
        |ne AS (SELECT COUNT(*) AS n FROM newe)
        |SELECT ne.n AS n_new_edges, c1.n AS tri_1_new, c2.n AS tri_2_new,
        |  c3.n AS tri_3_new, c1.n + c2.n + c3.n AS tri_added
        |FROM ne, c1, c2, c3""".stripMargin,

    "g03_pagerank" -> {
      val iterCtes = (1 to PageRankIters).map { i =>
        s"""c$i AS (SELECT e.v AS part, CAST(SUM((r${i - 1}.r * e.w) // wu.wt) AS BIGINT) AS s
           |  FROM e JOIN wu ON e.u = wu.u JOIN r${i - 1} ON r${i - 1}.part = e.u GROUP BY e.v),
           |r$i AS (SELECT part, 150000 + (s * 85) // 100 AS r FROM c$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cw AS (SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS w
        |       FROM op a JOIN op b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2),
        |e AS (SELECT x AS u, y AS v, w FROM cw UNION ALL SELECT y, x, w FROM cw),
        |wu AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wt, COUNT(*) AS n_nbrs FROM e GROUP BY u),
        |r0 AS (SELECT u AS part, CAST(1000000 AS BIGINT) AS r FROM wu),
        |$iterCtes
        |SELECT r.part, wu.n_nbrs, wu.wt, r.r AS rank_micro
        |FROM r$PageRankIters r JOIN wu ON wu.u = r.part
        |ORDER BY rank_micro DESC, r.part""".stripMargin
    },

    "g02_copurchase_jaccard" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |np AS (SELECT l_partkey, COUNT(*) AS n_ord FROM op GROUP BY 1),
        |pr AS (SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS n_xy
        |       FROM op a JOIN op b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT x, y, n_xy, nx.n_ord AS n_x, ny.n_ord AS n_y,
        |  CAST(n_xy AS DOUBLE) / (nx.n_ord + ny.n_ord - n_xy) AS jaccard
        |FROM pr JOIN np nx ON nx.l_partkey = x JOIN np ny ON ny.l_partkey = y
        |ORDER BY x, y""".stripMargin,

    "g01_triangles" ->
      """WITH e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT n, COUNT(*) AS d
        |  FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY 1),
        |o AS (SELECT CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.x ELSE e.y END AS u,
        |             CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.y ELSE e.x END AS v,
        |             CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN dy.d ELSE dx.d END AS dv
        |      FROM e JOIN deg dx ON dx.n = e.x JOIN deg dy ON dy.n = e.y),
        |tri AS (SELECT o1.u AS a, o1.v AS b, o2.v AS c
        |        FROM o o1 JOIN o o2 ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
        |        JOIN o o3 ON o3.u = o1.v AND o3.v = o2.v),
        |pn AS (SELECT n, COUNT(*) AS n_tri FROM
        |  (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |  GROUP BY 1)
        |SELECT p_brand, COUNT(*) AS n_parts, CAST(SUM(n_tri) AS BIGINT) AS tri_slots
        |FROM pn JOIN part ON p_partkey = n
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
