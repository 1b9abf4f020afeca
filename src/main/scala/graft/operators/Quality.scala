package graft.operators

import graft.functions.TextFns._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-statistics quality signals — the two filters a web-scale
  * pipeline runs after the per-document heuristics (t02) and before
  * dedup: a unigram language-model score and a repeated-n-gram
  * profile (the CCNet-LM / Gopher-repetition pair, re-expressed as
  * exact integer/rational arithmetic so the DuckDB oracle reproduces
  * every bit — no log(), no engine-specific float ordering).
  */
object Quality {

  /** t08: unigram corpus-frequency score. A document whose tokens
    * are corpus-rare is "surprising" under the corpus unigram LM;
    * mean token probability is the monotone inverse of mean surprisal
    * without the cross-engine log() hazard.
    *
    * Plan shape (100 TB): one map-side-combinable groupBy over the
    * exploded token stream builds the corpus frequency table, joined
    * back WITHOUT a broadcast hint — the unigram vocabulary grows
    * with the corpus (Heaps' law), so Catalyst broadcasts while it
    * fits and falls back to a shuffle join on `term` beyond that
    * (same rule as t11/d10). The per-doc pass is a second groupBy on
    * doc_id; the corpus total folds in as a broadcast 1-row agg —
    * no window, no driver-side count.
    */
  def t08UnigramLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    // OpCache, not a bare persist: the term-frequency table grows
    // with the vocabulary (Heaps' law), so an unreleased persist
    // would pin corpus-scaled storage for the session lifetime
    val cf = OpCache.cached(tok.groupBy("term").agg(count(lit(1)).as("cf")))
    val total = cf.agg(sum(col("cf")).as("total_tokens"))
    tok.join(cf, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cf")).as("sum_cf"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("sum_cf"),
        (col("sum_cf").cast("double") / col("n_tokens")).as("mean_cf"),
        (col("sum_cf").cast("double") / col("n_tokens") / col("total_tokens"))
          .as("mean_prob"))
      .orderBy("doc_id")
  }

  /** t09: repeated-n-gram profile (word bigrams) — the repetition
    * signal used to drop degenerate/templated documents: the share of
    * bigram instances that occur more than once within the document
    * and the single most-repeated bigram (max count, then smallest
    * bigram — a deterministic argmax via one `min(struct)` agg, no
    * window).
    *
    * Plan shape: explode to the non-distinct bigram stream, ONE
    * groupBy (doc_id, bigram) with map-side combine, one groupBy
    * doc_id. Both aggregations are partial-aggregated; nothing is
    * quadratic and no window touches the corpus.
    */
  def t09RepNgrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bi = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingleArray(col("t"), 2)).as("term"))
    val cnt = bi.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    cnt.groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        max(col("cnt")).as("top_count"),
        min(struct((lit(0L) - col("cnt")).as("nc"), col("term").as("t")))
          .as("m"),
        coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("dup_inst"))
      .select(col("doc_id"), col("n_bigrams"), col("top_count"),
        col("m.t").as("top_bigram"),
        col("dup_inst"),
        (col("dup_inst").cast("double") / col("n_bigrams")).as("dup_share"))
      .orderBy("doc_id")
  }

  /** t10: per-source vocabulary statistics — token mass, type count,
    * hapax count (terms seen once) and type/token ratio: the
    * vocabulary-health profile used to spot synthetic/templated
    * sources (low TTR) and OCR noise (hapax explosion).
    *
    * Plan shape: one groupBy (source, term) with map-side combine,
    * then one groupBy source over the (already tiny) per-term counts.
    */
  def t10VocabStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cf"))
    tf.groupBy("source")
      .agg(
        sum(col("cf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        coalesce(sum(when(col("cf") === 1, 1L)), lit(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens")).as("type_token_ratio"))
      .orderBy("source")
  }

  /** t11: bigram-LM novelty profile — per document, the extremes of
    * the corpus bigram conditional probability P(w2|w1) =
    * cf(w1 w2)/cf(w1) and the count of corpus-unique bigrams. A
    * sharper LM signal than t08's unigram score: templated text has
    * high min-probability, garbled text has many novel bigrams.
    *
    * Determinism: a MEAN of double ratios would depend on Spark's
    * partial-sum order — min/max/count are order-independent, so the
    * profile stays bit-exact cross-engine. cf tables carry no
    * broadcast hint (the bigram vocabulary grows with the corpus;
    * Catalyst broadcasts while it fits). */
  def t11BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val cf1 = tok.groupBy("term").agg(count(lit(1)).as("cf1"))
    val bi = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingleArray(col("t"), 2)).as("big"))
      .withColumn("w1", substring_index(col("big"), " ", 1))
    val cf2 = bi.groupBy("big").agg(count(lit(1)).as("cf2"))
    bi.join(cf2, "big")
      .join(cf1, col("w1") === col("term"))
      .withColumn("p", col("cf2").cast("double") / col("cf1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        coalesce(sum(when(col("cf2") === 1, 1L)), lit(0L)).as("n_novel"),
        min(col("p")).as("min_p"),
        max(col("p")).as("max_p"))
      .orderBy("doc_id")
  }

  /** t12: character-class profile — the Gopher-family character-level
    * filters that catch what token-level heuristics (t02) miss:
    * OCR noise (low alpha share), tables/code (digit + symbol share),
    * SHOUTING (upper share), and mid-sentence truncation (terminal
    * punctuation test). Counts are length-after-strip integer
    * arithmetic over explicit character classes (identical in Java
    * and RE2 — no \s, whose class differs between the engines by
    * \x0B), ratios divide the same operands in both engines, and the
    * truncation test is a substring compare, not a `$` anchor (Java
    * lets `$` match before a final newline; RE2 does not).
    * Pure per-row Column algebra — embarrassingly parallel. */
  def t12CharProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def nOf(cls: String): org.apache.spark.sql.Column =
      (length(col("text")) -
        length(regexp_replace(col("text"), cls, ""))).cast("long")
    docs.select(col("doc_id"), col("n_chars"), col("text"),
        nOf("[A-Za-z]").as("n_alpha"),
        nOf("[0-9]").as("n_digit"),
        nOf("[A-Z]").as("n_upper"),
        nOf("[ \\t\\n\\r]").as("n_ws"))
      .select(col("doc_id"), col("n_chars"), col("n_alpha"), col("n_digit"),
        col("n_upper"), col("n_ws"),
        (col("n_chars") - col("n_alpha") - col("n_digit") - col("n_ws"))
          .as("n_other"),
        (col("n_alpha").cast("double") / col("n_chars")).as("alpha_ratio"),
        ((col("n_chars") - col("n_alpha") - col("n_digit") - col("n_ws"))
          .cast("double") / col("n_chars")).as("symbol_ratio"),
        expr("right(trim(text), 1)").isin(".", "!", "?").as("ends_sentence"))
      .orderBy("doc_id")
  }

  /** t14: QUALITY FILTER with rule attribution — the Gopher-style
    * keep/drop verdict a pipeline actually acts on, with WHICH rules
    * fired recorded per document (the audit trail a corpus release
    * needs: "23% dropped, of which 61% too_short…"). Rules:
    *
    *  - too_short:    fewer than 25 tokens;
    *  - low_stopword: stopword ratio < 2% (Gopher's "has stop
    *    words" screen) — tested as `nstop·50 < nt`, exact integers;
    *  - high_dup:     distinct-token dup ratio > 65% —
    *    `(nt−nd)·100 > 65·nt`;
    *  - rep_bigram:   repeated-bigram instance share > 12% (t09's
    *    signal) — `dup_inst·100 > 12·n_bigrams`.
    *
    * Every rule test is integer arithmetic (no double compare can
    * drift between engines); `reasons` concatenates fired rules in
    * fixed order. Plan shape: t02's metrics are per-row; the bigram
    * profile is two map-side-combinable groupBys (t09's shape); one
    * hint-free join stitches them — linear scale-out. */
  def t14QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("t"))
    val stopArr = array(TextAnalysis.Stopwords.map(lit): _*)
    val m = d.select(
      col("doc_id"),
      size(col("t")).cast("long").as("nt"),
      size(array_distinct(col("t"))).cast("long").as("nd"),
      size(filter(col("t"), x => array_contains(stopArr, x))).cast("long").as("nstop"))
    val bi = d.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"),
        coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("dup_inst"))
    verdictFrom(m.join(bi, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("dup_inst", coalesce(col("dup_inst"), lit(0L))))
      .orderBy("doc_id")
  }

  /** t14's rule set over any (doc_id, nt, nd, nstop, n_bigrams,
    * dup_inst) frame — ONE definition shared by the batch operator
    * and [[graft.streaming.QualityStream]], so the streamed gate can
    * never drift from the oracle-checked rules. */
  private[graft] def verdictFrom(metrics: DataFrame): DataFrame = {
    val ruleCols = Seq("too_short", "low_stopword", "high_dup", "rep_bigram")
    metrics
      .withColumn("too_short", col("nt") < 25)
      .withColumn("low_stopword", col("nstop") * 50 < col("nt"))
      .withColumn("high_dup", (col("nt") - col("nd")) * 100 > col("nt") * 65)
      .withColumn("rep_bigram", col("dup_inst") * 100 > col("n_bigrams") * 12)
      .withColumn("n_rules",
        ruleCols.map(c => when(col(c), 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("keep", col("n_rules") === 0)
      .withColumn("reasons",
        concat_ws(";", ruleCols.map(c => when(col(c), lit(c))): _*))
      .select("doc_id", "too_short", "low_stopword", "high_dup", "rep_bigram",
        "n_rules", "keep", "reasons")
  }

  /** t15: CCNet-style LM BUCKETS — rank every document within its
    * language by the corpus unigram-LM fluency score (t08's signal)
    * and cut the ranking into head / middle / tail thirds, the
    * quality tiers CCNet ships as separate corpora. The score is the
    * EXACT integer ⌊10⁶·sum_cf/n_tokens⌋ computed overflow-free as
    * `(sum_cf div n)·10⁶ + ((sum_cf mod n)·10⁶) div n`, and the tier
    * tests are integer (`rank·3 ≤ n_lang`), so both engines agree
    * bit-for-bit.
    *
    * Scale shape — the per-language rank is computed WITHOUT a
    * whole-language window sort (a real corpus is mostly English, so
    * `Window.partitionBy(lang)` would sort ~the corpus in one task —
    * the exact hazard packCore's prefix sums avoid): scores are
    * range-bucketed into ≤2¹⁶+1 buckets by `score div bw` with
    * bw = ⌊max_score/2¹⁶⌋+1 (a broadcast 1-row agg — bucket order is
    * consistent with score order by construction), the within-bucket
    * rank is a window partitioned by (lang, bucket), and the
    * cross-bucket offsets are a descending running count over the
    * per-bucket totals aggregate (≥2¹⁶× smaller than the corpus) —
    * identical ranks to `row_number() OVER (PARTITION BY lang ORDER
    * BY score DESC, doc_id)`, which is what the oracle runs. */
  def t15LmBuckets(spark: SparkSession, dir: String): DataFrame =
    lmBucketsFrom(Tables.documents(spark, dir))

  /** The bucketing over any (doc_id, text, lang) frame — also driven
    * at replicated single-language scale by [[graft.Stress]]. */
  private[graft] def lmBucketsFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val cf = tok.groupBy("term").agg(count(lit(1)).as("cf"))
    // cached: the corpus-frequency pipeline (tokenize + cf join) is
    // the expensive part and BOTH rank phases scan it — the
    // within-bucket window and the per-bucket offsets aggregate
    val scored = OpCache.cached(tok.join(cf, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cf")).as("sum_cf"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumn("score", expr(
        "(sum_cf div n_tokens) * 1000000 + ((sum_cf % n_tokens) * 1000000) div n_tokens")))
    val bw = scored.agg(max(col("score")).as("mx"))
      .select((expr("mx div 65536") + lit(1L)).as("bw"))
    val bucketed = scored.crossJoin(broadcast(bw))
      .withColumn("bkt", expr("score div bw"))
    val wIn = Window.partitionBy("lang", "bkt")
      .orderBy(col("score").desc, col("doc_id"))
    val inner = bucketed.withColumn("rn", row_number().over(wIn).cast("long"))
    val wOff = Window.partitionBy("lang").orderBy(col("bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("lang", "bkt").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum(col("bc")).over(wOff), lit(0L)))
      .select("lang", "bkt", "off")
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    inner.join(broadcast(offsets), Seq("lang", "bkt"))
      .join(broadcast(nl), "lang")
      .withColumn("lm_rank", col("off") + col("rn"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("sum_cf"),
        col("score"), col("lm_rank"),
        when(col("lm_rank") * 3 <= col("n_lang"), "head")
          .when(col("lm_rank") * 3 <= col("n_lang") * 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  /** t16's ranked merge table: applied IN ORDER, each rule globally
    * replaces its pair with a fresh single private-use symbol — the
    * BPE mechanic (iterative ranked pair merges over an initial
    * character alphabet) with a fixed, deterministic table instead
    * of corpus-trained ranks. Later rules reference the symbols
    * earlier rules introduced ("the" = merge(th)+e, "ing" =
    * merge(in)+g), so the fold is genuinely hierarchical, not one
    * alternation pass. Rules are letters/PUA symbols only, so no
    * merge can cross a whitespace boundary and no rule collides
    * with document text (PUA codepoints don't occur in the corpus;
    * a production tokenizer uses byte-level symbols instead).
    * Both engines fold the SAME table — the oracle SQL is generated
    * from this Seq. */
  private[graft] val BpeMerges: Seq[(String, String)] = {
    def sym(i: Int): String = (0xE000 + i).toChar.toString
    Seq(
      "th" -> sym(0), "in" -> sym(1), "an" -> sym(2),
      "er" -> sym(3), "on" -> sym(4), "re" -> sym(5),
      (sym(0) + "e") -> sym(6), // the
      (sym(1) + "g") -> sym(7), // ing
      (sym(2) + "d") -> sym(8), // and
      "at" -> sym(9), "en" -> sym(10), "or" -> sym(11))
  }

  /** Merge-table token count of a text column: symbols remaining
    * after the ranked fold, whitespace excluded (each surviving
    * character/symbol = one token). Shared by t16 and the p02/p03
    * tokenizer-faithful budget variant (BpeSpec). */
  private[graft] def bpeTokenCount(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val merged = BpeMerges.foldLeft(lower(text)) {
      case (acc, (pat, rep)) => regexp_replace(acc, pat, rep)
    }
    length(regexp_replace(merged, "\\s+", "")).cast("long")
  }

  /** t16: tokenizer-faithful token counts — a deterministic mini-BPE
    * (fixed ranked merge table, see [[BpeMerges]]) next to the
    * whitespace-word count t01/p02/p03 budget on by default. Real
    * training budgets are tokenizer-tokens, not words; this makes
    * the gap a per-document number (bpe_per_word ≈ the fertility a
    * tokenizer report quotes) and gives the packing operators an
    * oracle-checked tokenizer-token column to budget with.
    *
    * Plan shape: pure per-row Column algebra inside the scan's
    * codegen stage (a fold of 13 regexp_replace calls) — no shuffle,
    * no UDF, no join; the count is exactly reproducible in DuckDB
    * because both engines fold the same literal table. */
  def t16BpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("t"))
    d.select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_ws_tokens"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long")
          .as("n_chars_nospace"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .withColumn("bpe_per_word",
        col("n_bpe_tokens").cast("double") / col("n_ws_tokens"))
      .orderBy("doc_id")
  }

  /** The t16 oracle's merge fold, generated from the SAME table the
    * Spark side folds. Shared with p14's packing oracle. */
  private[operators] def bpeMergeSql(inner: String): String =
    BpeMerges.foldLeft(inner) { case (acc, (pat, rep)) =>
      s"regexp_replace($acc, '$pat', '$rep', 'g')"
    }

  /** t28's merge-round count (the trained table's size, matching the
    * fixed table's 12 rules) and its symbol alphabet: PUA page
    * 0xE101.. — disjoint from t16's fixed-table page 0xE000.. so a
    * trained table can coexist with the fixed one in one pipeline
    * (and, like t16's, the symbols cannot collide with corpus text). */
  private[graft] val BpeTrainRounds = 12
  private[graft] def bpeTrainSym(r: Int): String = (0xE100 + r).toChar.toString

  /** Apply ANY ranked merge table by LITERAL (non-regex) replacement
    * — the trained-table twin of [[bpeTokenCount]]'s fixed-table
    * regex fold. Trained pairs come from corpus words and may carry
    * regex metacharacters ("e.", "s)"), so the trained path never
    * goes through a pattern engine; on the fixed table (letters/PUA
    * only) the two folds are equal, which is what lets a trained
    * table drop into t16's slot (BpeTrainSpec pins both facts). */
  private[graft] def bpeTokenCountWith(merges: Seq[(String, String)])(
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val merged = merges.foldLeft(lower(text)) {
      case (acc, (pat, rep)) => replace(acc, lit(pat), lit(rep))
    }
    length(regexp_replace(merged, "\\s+", "")).cast("long")
  }

  /** t28: TRAIN THE BPE MERGE TABLE IN-ENGINE (VERDICT r14 #1 — the
    * single highest-leverage gap in the pipeline story: t16/p14's
    * tokenizer-faithful token counts fold a HAND-FIXED 12-rule table,
    * so the budgets they feed are faithful to a toy). This is the
    * real induction step — iterative most-frequent-pair merges, the
    * published BPE algorithm (Sennrich et al. 2016; reference
    * implementations count adjacent symbol pairs weighted by word
    * frequency, merge the argmax globally, repeat) — run as exact
    * integer relational algebra so the WHOLE training run is
    * DuckDB-replayable, the t27 oracle-unrolled-training precedent.
    *
    * Mechanics per round r (1..12): over the word-frequency table
    * (words = whitespace tokens of lower(text) — t16's alphabet
    * convention), count every ADJACENT symbol pair (position-based,
    * so "aaa" yields (a,a) twice — the standard symbol-pair count),
    * weighted by word frequency; the argmax pair (max count, then
    * lexicographically smallest — a deterministic 1-row limit) merges
    * GLOBALLY into the fresh symbol [[bpeTrainSym]](r) by literal
    * leftmost non-overlapping replacement (`replace`, not a regex —
    * corpus pairs can carry metacharacters; leftmost-non-overlap is
    * the same greedy application order both engines implement).
    * Later rounds see earlier symbols, so learned rules chain
    * hierarchically exactly like the fixed table's ("the" = merge(th)
    * + e). Output grain (merge_round): the learned pair, its symbol,
    * its exact weighted count, and the corpus token mass remaining
    * after the merge — the training curve AND the shippable artifact
    * (pair → sym, ranked) in one frame.
    *
    * Plan shape (100 TB): the corpus compresses to its WORD-FREQUENCY
    * table in one map-side-combinable groupBy (vocabulary-scaled —
    * Heaps' law, the t08 rule) and every round after that touches
    * only that table: one pair explode (≤ word-length fan-out) + one
    * map-side-combinable pair groupBy + a 1-row argmax collect
    * (bounded control state, the t27 rule) + one per-row literal
    * replace. Round frames LOCALLY CHECKPOINT (lazy — the round's
    * own argmax/curve action materializes them) and the superseded
    * round releases eagerly: an uncached chain would re-run every
    * earlier round's replace per argmax action, and a merely-
    * PERSISTED chain (round 15's shape) kept accreting one plan
    * layer per round — Spark renders the full lineage per executed
    * query, which OOM'd t30's 24-round run before the round-16 fix.
    * Nothing re-scans the corpus after the first groupBy. */
  def t28TrainBpe(spark: SparkSession, dir: String): DataFrame =
    trainBpeFrom(spark, Tables.documents(spark, dir), BpeTrainRounds)

  /** t28's core over any (text) frame — BpeTrainSpec drives it with
    * a hand-checkable corpus against a plain-Scala reference
    * implementation. Returns one row per merge round. */
  private[graft] def trainBpeFrom(spark: SparkSession, docs: DataFrame,
                                  rounds: Int): DataFrame = {
    import spark.implicits._
    trainBpeCurve(docs, rounds)._1
      .toDF("merge_round", "pair", "merged_sym", "pair_freq",
        "tokens_after")
      .orderBy("merge_round")
  }

  /** The full training run for artifact callers
    * ([[graft.sources.TokenizerStore]], t30): the per-round curve
    * PLUS the round-0 corpus token mass (every character of every
    * word = one pre-merge symbol — the denominator of the
    * compression ratio the store's staleness monitor reads). */
  private[graft] def trainBpeCurve(docs: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long, Long)], Long) =
    trainLoop(docs, rounds, withCurve = true)

  /** The learned merge table alone — for the APPLY-side callers
    * (t29, p27) that discard the training curve (round-15 review
    * fix: the curve's per-round tokens_after aggregate is 12 extra
    * driver round-trips they never read). */
  private[graft] def trainBpeMerges(spark: SparkSession, docs: DataFrame,
                                    rounds: Int): Seq[(String, String)] =
    trainLoop(docs, rounds, withCurve = false)._1
      .map { case (_, pair, sym, _, _) => (pair, sym) }

  private def trainLoop(docs: DataFrame, rounds: Int, withCurve: Boolean)
      : (Seq[(Long, String, String, Long, Long)], Long) = {
    // each round advances through the ONE iterative-loop checkpoint
    // discipline (Components.advance — lazy localCheckpoint,
    // materialize-before-release, eager release; see its scaladoc
    // for the two real bugs the ordering prevents). On the
    // withCurve=true path the round's own curve aggregate
    // materializes the blocks — no extra job; the merges-only path
    // has no such action, so it pays one explicit foreachPartition
    // materialization job per round (still cheaper than the
    // O(rounds) corpus re-scans it prevents).
    var cur = docs
      .select(explode(tokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(false)
    // round-0 mass (one agg over the vocab-scaled persisted frame):
    // the pre-merge symbol count the training curve starts from
    val tokens0 =
      if (withCurve)
        cur.agg(sum(col("freq") * length(col("w"))).as("t"))
          .collect()(0).getLong(0)
      else -1L
    val learned = (1 to rounds).map { r =>
      val top = cur.filter(length(col("w")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"BPE training round $r: no adjacent pairs left to merge")
      val pair = top(0).getString(0)
      val cnt = top(0).getLong(1)
      val sym = bpeTrainSym(r)
      // replacement with a FRESH symbol is injective on the word set
      // (the symbol occurs nowhere yet, so the original word is
      // recoverable), hence no re-aggregation is needed
      val (ck, tokensAfter) = Components.advance(cur,
        cur.select(replace(col("w"), lit(pair), lit(sym)).as("w"),
          col("freq"))) { n =>
        if (withCurve)
          n.agg(sum(col("freq") * length(col("w"))).as("t"))
            .collect()(0).getLong(0)
        else {
          // the merges-only path has no action of its own — one
          // explicit pass materializes the blocks before the
          // superseded frame releases (the advance contract)
          n.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
          -1L
        }
      }
      cur = ck
      (r.toLong, pair, sym, cnt, tokensAfter)
    }
    Components.releaseCheckpoint(cur)
    (learned, tokens0)
  }

  /** qa06's sketch geometry: depth 4 × width 1024 counters, hash
    * family from the engine's LCG seeds (offsets 11..14 so the
    * constants are disjoint from minhash/simhash/bloom). Counter
    * table size is d×w REGARDLESS of corpus size — the property
    * that makes the sketch broadcastable at any scale. */
  private[operators] val CmsP = 2147483647L
  private[operators] val CmsWidth = 1024L
  private[operators] val CmsHashes: Seq[(Long, Long)] =
    (11 to 14).map(i =>
      ((1103515245L * i + 12345L) % CmsP, (69069L * i + 1234567L) % CmsP))

  /** qa06: COUNT-MIN SKETCH accuracy — the mergeable frequency
    * sketch as pure relational algebra, graded against exact counts.
    * qa01's HLL/quantile sketches are rows-only (engine internals
    * have no cross-engine oracle); a CMS built from integer hashing
    * + a (row, col) counter groupBy is bit-exact on both engines, so
    * THIS sketch goes through the full oracle gate. Per exact-top-20
    * token: exact count, the sketch estimate (min over the 4 counter
    * rows), and the overestimate — which is PROVABLY ≥ 0 (CMS never
    * undercounts; spec-pinned), so the column reads as the collision
    * bias the 4×1024 geometry costs on this corpus.
    *
    * Why a 100 TB pipeline wants it: exact heavy-hitter counting
    * shuffles the full term universe; the CMS counter table is
    * d×w = 4096 rows AT ANY CORPUS SIZE, built by one map-side-
    * combinable groupBy over the token stream and mergeable across
    * shards/days by cell-wise addition. The estimate join touches
    * only the candidate terms. Evaluation shape here (exact side
    * exists to grade the sketch); production keeps the counter
    * build + probe only. */
  def qa06CmsAccuracy(spark: SparkSession, dir: String): DataFrame =
    qa06From(Tables.documents(spark, dir))

  /** qa06's core over any (text) frame. The fixture vocabulary (31
    * distinct tokens over 4096 cells) makes the bias identically 0 —
    * correct but vacuous — so CmsSpec drives this with a 5000-term
    * synthetic corpus where collisions are forced and pins BOTH CMS
    * properties: never undercounts, and the collision bias is real. */
  private def cmsXm(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(term), 1, 15), 16, 10).cast("long") % CmsP

  /** The per-token-instance (j, c) cell projection — literally
    * shared with the streaming counters
    * ([[graft.streaming.QualityStream.cmsCounters]]) so the stream
    * cannot drift from the oracle-gated batch sketch. */
  private[graft] def cmsCells(toks: DataFrame): DataFrame = {
    def cmsCol(x: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column = {
      val (a, b) = CmsHashes(i)
      (lit(a) * x + lit(b)) % CmsP % CmsWidth
    }
    toks.select(explode(array((0 until 4).map(j =>
        struct(lit(j).as("j"), cmsCol(cmsXm(col("term")), j).as("c"))): _*)).as("jc"))
      .select(col("jc.j").as("j"), col("jc.c").as("c"))
  }

  /** The full d×w counter table over a (text) frame — batch twin of
    * the streaming running counters. */
  private[graft] def cmsCountersOf(documents: DataFrame): DataFrame =
    cmsCells(documents.select(explode(tokens(col("text"))).as("term")))
      .groupBy("j", "c").agg(count(lit(1)).as("n"))

  private[graft] def qa06From(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(explode(tokens(col("text"))).as("term"))
    val counters = cmsCountersOf(documents)
    val exact20 = toks.groupBy("term").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("term")).limit(20)
    val probes = exact20
      .select(col("term"), col("exact_n"),
        explode(array((0 until 4).map { j =>
          val (a, b) = CmsHashes(j)
          struct(lit(j).as("j"),
            ((lit(a) * cmsXm(col("term")) + lit(b)) % CmsP % CmsWidth).as("c"))
        }: _*)).as("jc"))
      .select(col("term"), col("exact_n"), col("jc.j").as("j"), col("jc.c").as("c"))
    probes.join(counters, Seq("j", "c"))
      .groupBy("term", "exact_n").agg(min(col("n")).as("cms_est"))
      .select(col("term"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overestimate"))
      .orderBy(col("exact_n").desc, col("term"))
  }

  /** t17: TOKEN-DIVERSITY profile via Gini impurity — the log-free
    * concentration signal (entropy's cross-engine hazard is log();
    * 1 − Σp² ranks the same pathologies with exact rational
    * arithmetic): per document, gini = (n² − Σc²)/n² over the
    * within-doc token counts, plus the single-token dominance share.
    * Templated/spammy pages (one token dominating, tiny type set)
    * read low gini + high top_share; both floats are single
    * divisions of exact int64 operands, so the DuckDB oracle
    * reproduces every bit. Complements t10 (corpus-level TTR) and
    * t09 (bigram repetition) at the per-document altitude.
    *
    * Plan shape (100 TB): two map-side-combinable groupBys keyed by
    * doc_id — no window, no join; scales with the token mass. */
  def t17TokenGini(spark: SparkSession, dir: String): DataFrame =
    t17From(Tables.documents(spark, dir))

  /** t17's core over any (doc_id, text) frame — Round8Spec pins the
    * constructed extremes (uniform, single-type, skewed). */
  private[graft] def t17From(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    tok.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sum_sq"),
        max(col("c")).as("max_c"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("sum_sq"),
        ((col("n_tokens") * col("n_tokens") - col("sum_sq")).cast("double") /
          (col("n_tokens") * col("n_tokens"))).as("gini"),
        (col("max_c").cast("double") / col("n_tokens")).as("top_share"))
      .orderBy("doc_id")
  }

  /** qa07's sketch geometry: m = 64 registers (6 bucket bits) over
    * the 60-bit md5-prefix hash — the remaining 54 bits feed the
    * leading-zero rank, so ranks live in 1..55 (55 = the all-zero
    * remainder). Register table size is ≤ m rows AT ANY CORPUS SIZE
    * — the property that makes the sketch broadcastable and
    * mergeable (per-shard registers combine by element-wise MAX). */
  private[operators] val HllM = 64L
  private[operators] val HllPow55: Long = 1L << 55
  /** alpha_64 · m² · 2⁵⁵ — the raw-estimate numerator, precomputed
    * so BOTH engines evaluate one literal-÷-BIGINT division (the
    * only float op in the query). 0.709 is the published alpha for
    * m = 64. */
  private[operators] val HllNum: Double = 0.709 * 4096.0 * HllPow55.toDouble

  /** The 60-bit md5-prefix item hash shared by the HLL registers
    * (qa07) and the bottom-k sample (qa09) — one definition, so the
    * two cardinality views hash identically. */
  private[operators] def hllX(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(term), 1, 15), 16, 10).cast("long")

  /** Bit length of the 54-bit remainder via a GENERATED comparison
    * chain — exact integer comparisons on both engines; no bin()/
    * log2() portability bets (DuckDB's bin() pads differently and
    * log2 rounds at boundaries). The same (0..53) loop emits the
    * Spark Column here and the oracle CASE in [[hllBitlenSql]]. */
  private[operators] def hllBitlen(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 to 53).foldLeft(lit(0): org.apache.spark.sql.Column)((acc, i) =>
      when(v >= (1L << i), lit(i + 1)).otherwise(acc))

  private[operators] def hllBitlenSql(v: String): String =
    (53 to 0 by -1).map(i => s"WHEN $v >= ${1L << i} THEN ${i + 1}")
      .mkString("CASE ", " ", " ELSE 0 END")

  /** 2^(55 − rank) as a generated rank→literal CASE (ranks 1..55) —
    * the scaled harmonic-sum term, exact int64 on both engines. */
  private[operators] def hllPow(rk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to 55).foldLeft(lit(0L): org.apache.spark.sql.Column)((acc, r) =>
      when(rk === r, lit(1L << (55 - r))).otherwise(acc))

  private[operators] def hllPowSql(rk: String): String =
    (1 to 55).map(r => s"WHEN $rk = $r THEN ${1L << (55 - r)}")
      .mkString("CASE ", " ", " ELSE 0 END")

  /** qa10: per-GROUP HLL distinct estimates — qa07's global sketch in
    * the shape production actually queries it: `GROUP BY source,
    * approx distinct tokens`. Spark's own approx_count_distinct is
    * engine-internal (qa01's rows-only situation); this is the
    * oracle-gated equivalent — per source, the 64-register sketch
    * (cells literally shared with qa07/stream_hll), the exact
    * distinct count beside it, and the per-source error the m = 64
    * geometry costs. State is |groups| × 64 rows at any corpus
    * size; everything is the qa07 integer algebra applied under a
    * group key. Small-range regime per group on the fixture
    * (documented, qa07's rule); the estimating regime is covered by
    * qa07's synthetic spec — the algebra is shared, only the
    * grouping differs. */
  def qa10HllBySource(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
    val regs = hllCells(toks)
      .groupBy("source", "bucket").agg(max(col("rk")).as("max_rank"))
    val sums = regs.groupBy("source")
      .agg(count(lit(1)).as("n_used"), sum(hllPow(col("max_rank"))).as("sp"))
      .select(col("source"), col("n_used"),
        (col("sp") + (lit(HllM) - col("n_used")) * lit(HllPow55)).as("sum_scaled"))
    val exact = toks.groupBy("source")
      .agg(countDistinct(col("term")).as("exact_distinct"))
    exact.join(sums, "source")
      .select(col("source"), col("exact_distinct"), col("n_used"),
        col("sum_scaled"),
        (lit(HllNum) / col("sum_scaled").cast("double")).as("est_raw"))
      .withColumn("err_abs", col("est_raw") - col("exact_distinct"))
      .orderBy("source")
  }

  /** qa09's sample size and the KMV numerator (k−1)·2⁶⁰ as ONE
    * precomputed double literal (2⁶⁶ overflows int64 — the HllNum
    * identical-literal rule). */
  private[operators] val KmvK = 64
  private[operators] val KmvNum: Double = 63.0 * math.pow(2.0, 60)

  /** qa09: BOTTOM-K (KMV) distinct sample — the k = 64 smallest
    * 60-bit item hashes over the DISTINCT token space: a uniform,
    * deterministic, MERGEABLE sample of distinct items. Uniformity
    * comes from the hash order (independent of frequency — a term
    * appearing once and a stopword are equally likely to be drawn),
    * and mergeability is the bottom-k algebra: re-taking the bottom
    * k of a union of per-shard bottom-k's equals the global bottom-k
    * — proved oracle-VISIBLY per row (`in_merged`, built from the
    * per-source re-take, is provably always true and hashed by the
    * gate). The same sample doubles as the KMV cardinality
    * estimator — est = (k−1)·2⁶⁰ / kth-smallest-hash — the
    * cross-check on qa07's HLL from an independent sketch family
    * (order statistics vs leading zeros) over the SAME shared hash.
    *
    * Why a 100 TB pipeline wants it: "pick 64 eval documents/terms
    * uniformly over distinct content, identically on every shard and
    * every rerun" is exactly this sample; shards ship 64 rows each
    * and the merge is a re-take, no coordination. The fixture's ~31
    * distinct tokens sit below k, where the sample is the whole
    * vocabulary and est = exact by the standard KMV small case
    * (documented, like qa07's small-range regime); HllSpec-style
    * synthetic coverage drives the estimating regime.
    *
    * Plan shape: distinct → hash → global TakeOrdered(64) (never a
    * global rank window — the qa03 rule; the per-row rank comes from
    * a 64×64 self-join count); the per-source path is a row_number
    * window PARTITIONED by source filtered to ≤ 64/source. */
  def qa09BottomkSample(spark: SparkSession, dir: String): DataFrame =
    qa09From(Tables.documents(spark, dir))

  private[graft] def qa09From(documents: DataFrame): DataFrame = {
    val st = documents
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .distinct()
    val terms = OpCache.cached(
      st.select("term").distinct().withColumn("hval", hllX(col("term"))))
    val smp = OpCache.cached(terms.orderBy("hval").limit(KmvK))
    val rk = smp.as("a").join(smp.as("b"),
        col("b.hval") <= col("a.hval"))
      .groupBy(col("a.term").as("term"), col("a.hval").as("hval"))
      .agg(count(lit(1)).as("smp_rank"))
    val perSrc = st.join(terms, "term")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("hval")))
      .filter(col("rn") <= KmvK)
      .select("term", "hval").distinct()
    val merged = perSrc.orderBy("hval").limit(KmvK)
    val ex = st.agg(countDistinct(col("term")).as("n_distinct"))
    val kth = smp.agg(max(col("hval")).as("kth"), count(lit(1)).as("n_sample"))
    rk.join(merged.select(col("term"), lit(true).as("in_merged")), Seq("term"), "left")
      .withColumn("in_merged", coalesce(col("in_merged"), lit(false)))
      .crossJoin(broadcast(ex)).crossJoin(broadcast(kth))
      .select(col("smp_rank"), col("term"), col("hval"), col("in_merged"),
        col("n_distinct"), col("n_sample"),
        when(col("n_sample") < KmvK, col("n_distinct").cast("double"))
          .otherwise(lit(KmvNum) / col("kth").cast("double")).as("est_distinct"))
      .orderBy("smp_rank")
  }

  /** The per-token-instance (bucket, rk) cell projection — literally
    * shared with the streaming registers
    * ([[graft.streaming.QualityStream.hllRegisters]]) so the stream
    * cannot drift from the oracle-gated batch sketch. Pass-through
    * columns (e.g. source) survive for the per-shard merge. */
  private[graft] def hllCells(toks: DataFrame): DataFrame = {
    val x = hllX(col("term"))
    toks.withColumn("bucket", x % HllM)
      .withColumn("rk", (lit(55) - hllBitlen(shiftright(x, 6))).cast("long"))
      .drop("term")
  }

  /** The ≤ m-row register table over a (text) frame — batch twin of
    * the streaming running registers. */
  private[graft] def hllRegistersOf(documents: DataFrame): DataFrame =
    hllCells(documents.select(explode(tokens(col("text"))).as("term")))
      .groupBy("bucket").agg(max(col("rk")).as("max_rank"))

  /** qa07: HYPERLOGLOG distinct-count sketch accuracy — the
    * mergeable cardinality sketch as pure relational algebra, graded
    * against the exact distinct count. qa06 covers frequency (CMS);
    * this covers cardinality — together the two canonical mergeable
    * sketches a 100 TB pipeline broadcasts instead of shuffling the
    * term universe. All sketch state is exact int64: bucket = low 6
    * hash bits, rank = leading-zero position of the 54-bit remainder
    * (generated comparison chain), and the harmonic sum is kept in
    * exact 2⁵⁵-scaled integers — the ONE float op is the final
    * literal/BIGINT division, identical on both engines.
    *
    * Mergeability is oracle-VISIBLE, not just asserted: the query
    * also builds per-source registers and max-merges them;
    * `merged_sum_scaled` provably equals `sum_scaled` (max is
    * associative over shards), and the gate hashes both.
    *
    * The fixture vocabulary (~31 distinct tokens over 64 registers)
    * sits in HLL's small-range regime where the RAW estimate
    * overshoots — correct but uninformative, like qa06's zero-bias
    * fixture — so HllSpec drives the same algebra with a 5000-term
    * seeded corpus and pins the published error envelope
    * (1.04/√64 ≈ 13% std error) plus a bit-for-bit plain-Scala
    * register simulation. Production keeps the register build +
    * merge only (no exact side). */
  def qa07HllDistinct(spark: SparkSession, dir: String): DataFrame =
    qa07From(Tables.documents(spark, dir))

  /** qa11's width grid — shared by the Spark sweep and the generated
    * oracle (the qa05/s14 one-fragment rule). */
  private[graft] val CmsWidthGrid: Seq[Long] = Seq(16L, 64L, 1024L)

  /** qa11: CMS WIDTH calibration curve — qa05's role (bloom FP vs
    * bits) for the frequency sketch: qa06's accuracy measurement
    * swept over counter widths {16, 64, 1024} with the SAME 4-row
    * hash family, so the overestimate column becomes the sizing
    * curve a deployment reads before provisioning d×w memory. The
    * fixture's 31 types make the bias REAL at the small widths
    * (pigeonhole: 31 terms over 16 counters per row) and ~0 at
    * 1024 — the curve's whole story on one screen. Token stream and
    * exact-top-20 are built once (OpCache) and shared by all three
    * sweep branches; each branch's counter table is d×w rows at any
    * corpus size. */
  def qa11CmsWidthCurve(spark: SparkSession, dir: String): DataFrame = {
    val toks = OpCache.cached(Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("term")))
    val exact20 = OpCache.cached(
      toks.groupBy("term").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("term")).limit(20))
    def cmsColW(x: org.apache.spark.sql.Column, j: Int, w: Long) = {
      val (a, b) = CmsHashes(j)
      (lit(a) * x + lit(b)) % CmsP % w
    }
    CmsWidthGrid.map { w =>
      val counters = toks
        .select(explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"), cmsColW(cmsXm(col("term")), j, w).as("c"))): _*)).as("jc"))
        .select(col("jc.j").as("j"), col("jc.c").as("c"))
        .groupBy("j", "c").agg(count(lit(1)).as("n"))
      exact20
        .select(col("term"), col("exact_n"),
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("j"), cmsColW(cmsXm(col("term")), j, w).as("c"))): _*)).as("jc"))
        .select(col("term"), col("exact_n"), col("jc.j").as("j"), col("jc.c").as("c"))
        .join(counters, Seq("j", "c"))
        .groupBy("term", "exact_n").agg(min(col("n")).as("cms_est"))
        .select(lit(w).as("width"), col("term"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overestimate"))
    }.reduce(_ union _)
      .orderBy(col("width"), col("exact_n").desc, col("term"))
  }

  private[graft] def qa07From(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("source"), explode(tokens(col("text"))).as("term"))
    val cells = hllCells(toks)
    val global = cells.groupBy("bucket").agg(max(col("rk")).as("max_rank"))
    val merged = cells.groupBy("source", "bucket").agg(max(col("rk")).as("mr"))
      .groupBy("bucket").agg(max(col("mr")).as("max_rank"))
    def summed(regs: DataFrame, alias: String): DataFrame =
      regs.agg(count(lit(1)).as("n_used"), sum(hllPow(col("max_rank"))).as("sp"))
        .select(col("n_used"),
          (col("sp") + (lit(HllM) - col("n_used")) * lit(HllPow55)).as(alias))
    val g = summed(global, "sum_scaled")
    val m = summed(merged, "merged_sum_scaled").select("merged_sum_scaled")
    val exact = toks.agg(countDistinct(col("term")).as("exact_distinct"))
    // three 1-row frames — bounded broadcast cross joins (the
    // 1-row-totals pattern, same as t08's corpus total)
    exact.crossJoin(g).crossJoin(m)
      .select(col("exact_distinct"), col("n_used"),
        (lit(HllM) - col("n_used")).as("n_zero"),
        col("sum_scaled"), col("merged_sum_scaled"),
        (lit(HllNum) / col("sum_scaled").cast("double")).as("est_raw"))
      .withColumn("err_abs", col("est_raw") - col("exact_distinct"))
  }

  /** t23's hashed-feature dimensionality — generated into both
    * engines (the t16 generated-constant rule). */
  private[graft] val ClassifierDim = 64L

  /** t23's FROZEN weight vector: weight of feature bucket f is
    * ((1103515245·(f+1) + 12345) mod 197) − 98 — the s02
    * random-hyperplane component rule, pure int64 math shared with
    * the oracle. A production deployment loads trained weights from
    * a frozen artifact instead; the SCORING algebra (hash → bucket →
    * weight → margin) is identical. */
  private[graft] def classifierWeight(
      f: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(1103515245L) * (f + 1) + 12345L) % 197 - 98

  /** t23: MODEL-BASED QUALITY CLASSIFIER (VERDICT r13 #3) — the one
    * standard pretraining-curation stage the rule-based t02/t14 pair
    * stops short of: production pipelines (CCNet/DCLM/FineWeb class)
    * gate documents on a LEARNED classifier score, served as a linear
    * model over hashed token features. Here the weight vector is a
    * fixed generated-integer artifact ([[classifierWeight]] — frozen
    * weights are data, not training, in the serving path; the
    * t16/qa07 precedent), features are the token's vocabulary id mod
    * [[ClassifierDim]], and the verdict is the sign of the exact
    * integer score. Output per doc: token count, score, per-token
    * margin (ONE division of exact integers), keep/drop verdict and
    * the top-3 contributing feature buckets with their exact
    * contributions — the audit view a curation reviewer reads.
    *
    * Feature ids use the rank vocabulary for cross-engine parity
    * (the TextFns scale note: a production caller swaps in
    * xxhash64(term) — content-hashed, corpus-independent — and skips
    * the vocab join entirely; every downstream step only assumes
    * "term → int64 id").
    *
    * Plan shape (100 TB): tokenize + explode + ONE map-side-combinable
    * groupBy to (doc, feature) — 64 buckets cap the per-doc row count;
    * the vocab join is hint-free (corpus-scaled vocabulary, the
    * t08/d10 rule); the top-3 window is partitioned by doc_id over
    * ≤64 rows/doc. No corpus², no driver state. */
  def t23QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    classifierScores(tok, vocab(tok)).orderBy("doc_id")
  }

  /** The classifier core over an exploded (doc_id, term) token frame
    * and a (term, tid) vocabulary — ONE definition for the batch key,
    * the streaming twin ([[graft.streaming.QualityStream
    * .classifierStream]] — frozen vocabulary, per-micro-batch scoring)
    * and the p26 curation composition, so the gate cannot drift
    * between the key, the stream and the pipeline. */
  private[graft] def classifierScores(tok: DataFrame,
                                      vocab: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feat = tok.join(vocab, "term")
      .groupBy(col("doc_id"), (col("tid") % ClassifierDim).as("f"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("c", col("cnt") * classifierWeight(col("f")))
    // top-3 features by |contribution| (f unique per doc → total
    // order); ≤64 rows per doc_id partition
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(abs(col("c")).desc, col("f").asc)
    feat.withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"), sum(col("c")).as("score"),
        max(when(col("rn") === 1, col("f"))).as("f1"),
        max(when(col("rn") === 1, col("c"))).as("c1"),
        max(when(col("rn") === 2, col("f"))).as("f2"),
        max(when(col("rn") === 2, col("c"))).as("c2"),
        max(when(col("rn") === 3, col("f"))).as("f3"),
        max(when(col("rn") === 3, col("c"))).as("c3"))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        (col("score").cast("double") / col("n_tokens")).as("margin"),
        (col("score") >= 0).as("keep"),
        col("f1"), col("c1"), col("f2"), col("c2"), col("f3"), col("c3"))
  }

  /** t26: CLASSIFIER SCORE DRIFT (round 14 — the monitor lattice
    * member for the learned gate: qa04 dense / mm12 media / t20
    * sparse / g05 graph / THIS the classifier): the
    * WHEN-to-recalibrate signal for a frozen classifier artifact.
    * Arrivals score through the FROZEN vocabulary+weights exactly as
    * the serving stream does (unseen terms drop out of the vocab
    * join — the hashing-trick serving convention), over t20's two
    * DERIVED arrival regimes (`inject`: %10==8 docs re-uploaded with
    * ONE novel token prepended, ~2% unseen — below any trigger;
    * `reverse`: %10==9 docs text-reversed, ~97% unseen — fires any
    * threshold). Output per regime: doc/token masses, the
    * unseen-token share (the feature-coverage loss — tokens the
    * frozen model simply cannot see), the keep share of scored docs,
    * the mean margin (Σscore/Σscored-tokens, ONE division of exact
    * integers) and its exact-arithmetic drift vs the corpus baseline
    * (a difference of two such divisions — the qa04 float
    * discipline). A deployment reads unseen_share as "retrain the
    * vocabulary", margin_drift as "recalibrate the threshold".
    *
    * Plan: ONE corpus tokenize pass feeds the vocab and the 1-row
    * baseline (both bounded, cached); each regime is arrival-scaled
    * tokenize ⋈ vocab — never a corpus re-scan per regime (the t20
    * shape). */
  def t26ScoreDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val tokAll = OpCache.cached(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("term")))
    val v = OpCache.cached(vocab(tokAll))
    val baseline = classifierScores(tokAll, v)
      .agg(sum(col("score")).as("c_score"), sum(col("n_tokens")).as("c_tok"))
      .select((col("c_score").cast("double") / col("c_tok")).as("corpus_margin"))
    val inject = graft.operators.TextAnalysis.injectArrivals(docs)
    val reversed = docs.filter(col("doc_id") % 10 === 9)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        reverse(col("text")).as("text"))
    def regimeRow(arr: DataFrame, regime: String): DataFrame = {
      val atok = OpCache.cached(arr.select(col("doc_id"),
        explode(tokens(col("text"))).as("term")))
      // n_tok_arr − n_tok_scored IS the unseen count (classifier
      // scoring inner-joins the vocab), so no separate probe join
      val masses = atok.agg(count(lit(1)).as("n_tok_arr"))
      val perDoc = classifierScores(atok, v)
      val nDocs = arr.agg(count(lit(1)).as("n_docs"))
      perDoc.agg(count(lit(1)).as("n_docs_scored"),
          coalesce(sum(when(col("keep"), 1L)), lit(0L)).as("n_keep"),
          sum(col("score")).as("a_score"), sum(col("n_tokens")).as("n_tok_scored"))
        .crossJoin(broadcast(nDocs))
        .crossJoin(broadcast(masses))
        .crossJoin(broadcast(baseline))
        .select(lit(regime).as("regime"), col("n_docs"), col("n_docs_scored"),
          col("n_keep"), col("n_tok_arr"), col("n_tok_scored"),
          ((col("n_tok_arr") - col("n_tok_scored")).cast("double") /
            col("n_tok_arr")).as("unseen_share"),
          when(col("n_tok_scored") > 0,
            col("a_score").cast("double") / col("n_tok_scored")).as("mean_margin"),
          col("corpus_margin"),
          when(col("n_tok_scored") > 0,
            col("a_score").cast("double") / col("n_tok_scored") -
              col("corpus_margin")).as("margin_drift"))
    }
    regimeRow(inject, "inject").unionByName(regimeRow(reversed, "reverse"))
      .orderBy("regime")
  }

  /** t27's epoch count — generated into both engines' unrolled
    * update chains (the t19/g03 iteration rule). */
  private[graft] val PerceptronEpochs = 8

  /** t27: TRAIN THE QUALITY CLASSIFIER IN-ENGINE (round 14 — the
    * missing FIRST step of the gate's lifecycle, now closed
    * end-to-end: t27 TRAIN -> t24 calibrate -> t23 serve ->
    * stream_classifier stream -> t26 monitor): a POCKET batch
    * perceptron over the hashed-feature space, with EVERY step in
    * exact integer arithmetic so the whole training run is
    * DuckDB-replayable. Features are length-NORMALIZED exact
    * integers x = (cnt·1e6) div n_tokens (the raw counts carry a
    * document-length confound that swamps any per-bucket signal —
    * measured: un-normalized batch updates limit-cycle at the
    * majority-class floor); the target is the stop-density rule
    * nstop·12 >= n_tokens (+1 natural-prose-like / −1 — an integer
    * cross-multiply, genuinely linearly expressible over the buckets
    * the 7 stopwords hash into, yet noisy through hash collisions —
    * a REAL learning problem, not a tautology). Per unrolled epoch e
    * (sign(0)=+1, rate 1): evaluate n_err under w_{e−1}, then add
    * Σ_err y·x per feature — and because batch perceptron OSCILLATES
    * by nature (measured: epoch errors cycle 123→24→83→…), the
    * POCKET rule marks the best evaluated epoch (min n_err, earliest
    * tie) — the artifact a deployment freezes into t23's weight
    * slot. Output grain (epoch, f): the weights EVALUATED in that
    * epoch, its exact error count, and the pocket flag — the
    * training curve and the final artifact in one frame.
    *
    * Plan: the (doc, feature) frame and the label frame build once
    * (cached); each epoch is a broadcast of the 64-row weight vector
    * + two hash aggregates — the g03/t19 iterative-join class. The
    * weight state is CONTROL-scaled (64 rows) and referenced twice
    * per epoch (scoring + update), so it is literal-materialized per
    * epoch — the p25 exponential-lineage rule. */
  def t27TrainClassifier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, epochs) = trainEpochsFrom(spark,
      Tables.documents(spark, dir).select("doc_id", "text"))
    val pocketEpoch = epochs.minBy { case (e, _, n) => (n, e) }._1
    epochs.map { case (e, wE, nErr) =>
      wE.map { case (f, wv) =>
        (e.toLong, f, wv, nErr, e == pocketEpoch) }
        .toDF("epoch", "f", "w", "n_err", "is_pocket")
    }.reduce(_ unionByName _).orderBy("epoch", "f")
  }

  /** t27's training loop over any (doc_id, text) frame — ONE
    * definition for the oracle key and
    * [[graft.sources.ClassifierStore.freeze]] (the refreeze loop's
    * retrain action, round 15), so a retrained artifact cannot drift
    * from the oracle-gated training algebra. Returns the (cached)
    * training vocabulary — the artifact's feature space — and, per
    * epoch, the weights EVALUATED in that epoch with their exact
    * error count. */
  private[graft] def trainEpochsFrom(spark: SparkSession, docs: DataFrame)
      : (DataFrame, Seq[(Int, Seq[(Long, Long)], Long)]) = {
    import spark.implicits._
    val d = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    val stopArr = array(graft.operators.TextAnalysis.Stopwords.map(lit): _*)
    val meta = d.select(col("doc_id"), size(col("t")).cast("long").as("nt"),
      size(filter(col("t"), x => array_contains(stopArr, x)))
        .cast("long").as("nstop"))
    val tok = d.select(col("doc_id"), explode(col("t")).as("term"))
    val v = OpCache.cached(vocab(tok))
    // length-normalized exact-integer features
    val feat = OpCache.cached(tok.join(v, "term")
      .groupBy(col("doc_id"), (col("tid") % ClassifierDim).as("f"))
      .agg(count(lit(1)).as("cnt"))
      .join(meta.select("doc_id", "nt"), "doc_id")
      .select(col("doc_id"), col("f"),
        expr("(cnt * 1000000) div nt").as("x")))
    // the stop-density target: an exact integer cross-multiply
    val y = OpCache.cached(meta.select(col("doc_id"),
      when(col("nstop") * 12 >= col("nt"), 1L).otherwise(-1L).as("y")))
    var w: Seq[(Long, Long)] = (0L until ClassifierDim).map(f => (f, 0L))
    val epochs = (1 to PerceptronEpochs).map { e =>
      val wEval = w
      val scored = pocketScores(feat, wEval.toDF("f", "w"))
      // persisted: the error frame feeds TWO actions (the update
      // collect and the count) — uncached, each re-runs the epoch's
      // scoring join, doubling every epoch's corpus pass
      val errs = scored.join(y, "doc_id")
        .filter((col("y") === 1L && col("s") < 0) ||
          (col("y") === -1L && col("s") >= 0))
        .select("doc_id", "y").persist()
      // ≤64-row update + a 1-row error count — bounded control state,
      // collected per epoch (the p25 literal-reset rule)
      val upd = feat.join(errs, "doc_id")
        .groupBy("f").agg(sum(col("y") * col("x")).as("dd"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val errCount = errs.count()
      errs.unpersist()
      w = w.map { case (f, wv) => (f, wv + upd.getOrElse(f, 0L)) }
      (e, wEval, errCount)
    }
    (v, epochs)
  }

  /** The pocket artifact of one training run: the vocabulary, the
    * best evaluated epoch's weights (min n_err, earliest tie — the
    * pocket rule) and that epoch's exact error count. */
  private[graft] def pocketArtifact(spark: SparkSession, docs: DataFrame)
      : (DataFrame, Seq[(Long, Long)], Long) = {
    val (v, epochs) = trainEpochsFrom(spark, docs)
    val (_, w, n) = epochs.minBy { case (e, _, n) => (n, e) }
    (v, w, n)
  }

  /** The t27 evaluation join: per-doc score s = Σ x·w of a
    * length-normalized feature frame against a ≤64-row weight frame
    * (broadcast control state) — ONE definition for the training
    * loop's per-epoch evaluation and the frozen artifact's serving
    * read ([[frozenScores]]), so the serving sign convention can
    * never drift from the trained decision rule. */
  private[graft] def pocketScores(feat: DataFrame,
                                  weights: DataFrame): DataFrame =
    feat.join(broadcast(weights), "f")
      .groupBy("doc_id").agg(sum(col("x") * col("w")).as("s"))

  /** SERVING scores of a (doc_id, text) frame under a FROZEN
    * (vocab, weights) artifact — the t27 evaluation rule as the read
    * path: x = (cnt·10⁶) div nt exactly as trained, s = Σ x·w through
    * the ONE [[pocketScores]] join, keep = s ≥ 0 (sign(0)=+1, the
    * training convention). Terms unseen by the frozen vocabulary
    * drop out of the join (the hashing-trick serving convention —
    * t26's monitored feature-coverage loss); n_tokens still counts
    * EVERY arrival token, so the normalization matches training and
    * n_tokens − n_tokens_seen is the per-doc unseen mass. */
  private[graft] def frozenScores(docs: DataFrame, vocabDf: DataFrame,
                                  weights: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    val nt = d.select(col("doc_id"), size(col("t")).cast("long").as("nt"))
    val feat = d.select(col("doc_id"), explode(col("t")).as("term"))
      .join(vocabDf, "term")
      .groupBy(col("doc_id"), (col("tid") % ClassifierDim).as("f"))
      .agg(count(lit(1)).as("cnt"))
      .join(nt, "doc_id")
      .select(col("doc_id"), col("f"), col("cnt"),
        expr("(cnt * 1000000) div nt").as("x"))
    val seen = feat.groupBy("doc_id").agg(sum(col("cnt")).as("seen"))
    // EVERY document gets a verdict (round-15 review fix: the inner
    // joins silently dropped docs whose every token is outside the
    // frozen vocabulary — an ingest gate that neither keeps nor
    // drops): a fully-novel doc has no surviving features, so by the
    // convention s = 0 and keep = (0 ≥ 0) = true, exactly what the
    // left joins + coalesce produce
    nt.join(pocketScores(feat.select("doc_id", "f", "x"), weights),
        Seq("doc_id"), "left")
      .join(seen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nt").as("n_tokens"),
        coalesce(col("seen"), lit(0L)).as("n_tokens_seen"),
        coalesce(col("s"), lit(0L)).as("score"),
        (coalesce(col("s"), lit(0L)) >= 0).as("keep"))
  }

  /** t29: TOKEN COUNTS UNDER THE TRAINED TABLE (round 15 — t28's
    * application step, closing the loop the fixed-table t16 opened:
    * train the merges in-engine, then BUDGET with them): per
    * document, the whitespace count, the token count under the
    * TRAINED 12-rule table (t28's run re-derived, applied through
    * the literal [[bpeTokenCountWith]] fold) and under the FIXED
    * t16 table, plus their ratio (a division of identical integer
    * operands). The strongest cross-engine pin in the family: both
    * engines must independently reproduce every learned merge AND
    * every per-document fold of those merges — one drifted argmax
    * anywhere in the 12 rounds changes downstream counts and fails
    * the hash.
    *
    * Plan shape: training as t28 (vocabulary-scaled rounds); the
    * learned table collects as 12 rows of bounded control state
    * (the t27 rule) and the counting pass is pure per-row Column
    * algebra inside the scan's codegen stage — the t16 shape with a
    * trained table in the slot. */
  def t29TrainedTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val trained = trainBpeMerges(spark, docs.select("doc_id", "text"),
      BpeTrainRounds)
    docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        bpeTokenCountWith(trained)(col("text")).as("n_bpe_trained"),
        bpeTokenCount(col("text")).as("n_bpe_fixed"))
      .withColumn("trained_per_fixed",
        col("n_bpe_trained").cast("double") / col("n_bpe_fixed"))
      .orderBy("doc_id")
  }

  /** t30's merge-count grid: the candidate table sizes a deployment
    * calibrates between (t28 fixes 12 by constant; this sweep is the
    * evidence for that choice). Generated into both engines (the
    * qa11/qa05 sweep-constant rule). */
  private[graft] val BpeCalibrationGrid: Seq[Int] = Seq(4, 12, 24)

  /** t30: TOKENIZER MERGE-COUNT CALIBRATION CURVE (VERDICT r15 #5)
    * — the qa11/qa05 geometry-sweep pattern applied to BPE training:
    * per candidate merge count r ∈ [[BpeCalibrationGrid]], the merge
    * learned at round r, the corpus token mass remaining after it,
    * the pre-merge mass, and the compression ratio (ONE division of
    * identical exact integers). The curve a deployment reads before
    * pinning the table size: where compression flattens, more merges
    * stop paying.
    *
    * ONE training run, not three (the sweep is a PROJECTION): merges
    * chain deterministically — round r's argmax depends only on
    * rounds 1..r−1 — so training once to max(grid) yields every
    * smaller setting's exact curve as a prefix (BpeCalibrationSpec
    * pins this prefix-stability against an independent shorter run).
    * Plan shape: t28's (one corpus word-frequency groupBy, then
    * vocab-scaled rounds), just run to 24; the grid projection is
    * driver-side arithmetic over the collected 24-row curve. */
  def t30MergeCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (curve, tokens0) = trainBpeCurve(
      Tables.documents(spark, dir), BpeCalibrationGrid.max)
    val byRound = curve.map(c => c._1 -> c).toMap
    BpeCalibrationGrid.map { r =>
      val (_, pair, sym, freq, after) = byRound(r.toLong)
      (r.toLong, pair, sym, freq, after, tokens0,
        after.toDouble / tokens0)
    }.toDF("merge_round", "pair", "merged_sym", "pair_freq",
      "tokens_after", "tokens_before", "compression_ratio")
      .orderBy("merge_round")
  }

  /** The tokenizer-drift mass aggregate — ONE definition for the
    * hash-gated t32 monitor and the store-backed staleness read
    * ([[graft.sources.TokenizerStore.staleness]]), so the serving
    * monitor cannot drift from the oracle-checked algebra: per
    * frame, the doc count, the pre-merge symbol mass (every
    * non-whitespace character of lower(text) = one symbol) and the
    * post-fold token mass under the given merge table. One
    * arrival-scaled aggregate; the fold is per-row codegen algebra. */
  private[graft] def compressionMasses(df: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(length(regexp_replace(lower(col("text")), "\\s+", ""))
        .cast("long")), lit(0L)).as("tok_before"),
      coalesce(sum(bpeTokenCountWith(merges)(col("text"))), lit(0L))
        .as("tok_after"))

  /** t32: TOKENIZER COMPRESSION DRIFT (round 16 — the tokenizer
    * family's monitor as a HASH-GATED key, closing the last
    * monitor-lattice asymmetry: qa04/mm12/t20/t26/g05/g09 are all
    * full-oracle keys while the tokenizer's staleness was spec-gated
    * only): per derived arrival regime — t26's inject (known text
    * plus one novel token per doc) and reverse (drifted domain) —
    * the exact symbol masses before/after folding the TRAINED merge
    * table, the compression ratio, and its drift vs the corpus's own
    * ratio. The signal a deployment alerts on: the inject regime
    * drifts ~0.005 (rules still fire — no retrain), the reverse
    * regime ~0.18 (the learned pairs stop matching — retrain). Both
    * ratios are divisions of identical exact integers and the drift
    * a difference of two such doubles, so the hash gate pins the
    * whole monitor cross-engine. ONE definition with the store's
    * staleness read ([[compressionMasses]]). Plan: the t28 training
    * chain (vocab-scaled) + three bounded aggregates — never a
    * second corpus pass beyond the folds. */
  def t32CompressionDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val m = trainBpeMerges(spark, docs, BpeTrainRounds)
    val baseline = compressionMasses(docs, m)
      .select((col("tok_after").cast("double") / col("tok_before"))
        .as("corpus_ratio"))
    val inject = graft.operators.TextAnalysis.injectArrivals(docs)
    val reversed = docs.filter(col("doc_id") % 10 === 9)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        reverse(col("text")).as("text"))
    def regimeRow(arr: DataFrame, regime: String): DataFrame =
      compressionMasses(arr, m)
        .crossJoin(broadcast(baseline))
        .select(lit(regime).as("regime"), col("n_docs"),
          col("tok_before"), col("tok_after"),
          (col("tok_after").cast("double") / col("tok_before"))
            .as("arrival_ratio"),
          col("corpus_ratio"),
          (col("tok_after").cast("double") / col("tok_before") -
            col("corpus_ratio")).as("ratio_drift"))
    regimeRow(inject, "inject").unionByName(regimeRow(reversed, "reverse"))
      .orderBy("regime")
  }

  /** t31: TRAINED TOKENS OFF THE FROZEN ARTIFACT (VERDICT r15 #1 —
    * the serving read path t29 lacked): freeze the trained merge
    * table through [[graft.sources.TokenizerStore]], then tokenize
    * the corpus against the FROZEN generation — train once, serve
    * many, the g06/g07 freeze→read key shape. The key runs
    * freeze→serve (the driver's Verify starts fresh); the bench's
    * t31_frozen_tokens entry times the read path alone with the
    * freeze amortized into prepare. The oracle re-derives the merge
    * chain (training is deterministic, so frozen == retrained on the
    * same corpus) and folds per document — the t29 pin routed
    * through the persisted artifact. */
  def t31FrozenTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.sources.TokenizerStore.freeze(
      docs.select("doc_id", "text"), "t31_frozen")
    graft.sources.TokenizerStore.tokenCountsFrozen(spark, docs, "t31_frozen")
      .orderBy("doc_id")
  }

  /** t24's threshold grid in MILLI-margin units (margin = score per
    * token) — generated into both engines (the qa05/s14 sweep rule):
    * the operating points a curation team actually tunes between. */
  private[graft] val GateThresholdGrid: Seq[Long] =
    Seq(-20L, -10L, -5L, 0L, 5L, 10L, 20L)

  /** t24: CLASSIFIER GATE CALIBRATION (round 14 continuation of t23)
    * — the threshold-sweep operating curve a curation team reads
    * before picking the learned gate's cutoff (qa05's
    * bloom-geometry-curve role for the classifier; DCLM-class
    * pipelines publish exactly this table): per candidate threshold
    * θ (milli-margin units, [[GateThresholdGrid]]), the corpus keep
    * mass under `score·1000 ≥ θ·n_tokens` (exact cross-multiplied
    * integers — no float margin ever compared) and the agreement
    * structure against the rule-based t02/p01 gate (quality ≥ 0.5):
    * both-keep / classifier-only / rules-only counts, kept token
    * mass, and the agreement share (ONE division of exact integers).
    * The rule gate's 0.5 compare is integer-exact the qualityCtes
    * way on the oracle side and the same double compare both engines
    * evaluate identically (quality is a sum of exact divisions — the
    * t02 hash-green precedent).
    *
    * Plan shape: t23's (doc, feature) aggregate reduced to one
    * per-doc (score, n_tokens) frame + t02's per-doc quality — both
    * corpus-scaled, joined once on doc_id; the 7-row threshold grid
    * broadcast-crosses the per-doc frame and ONE bounded groupBy
    * (≤ grid size) emits the curve. No window, no corpus². */
  def t24GateCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val cls = classifierScores(tok, vocab(tok))
      .select("doc_id", "n_tokens", "score")
    val qual = graft.operators.TextAnalysis.t02Quality(spark, dir)
      .select(col("doc_id"), col("quality"))
    val perDoc = cls.join(qual, "doc_id")
      .withColumn("rules_keep", col("quality") >= 0.5)
    val grid = GateThresholdGrid.toDF("theta_milli")
    perDoc.crossJoin(broadcast(grid))
      .withColumn("cls_keep",
        col("score") * 1000 >= col("theta_milli") * col("n_tokens"))
      .groupBy("theta_milli")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cls_keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("cls_keep"), col("n_tokens")).otherwise(0L)).as("tokens_kept"),
        sum(when(col("cls_keep") && col("rules_keep"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("cls_keep") && !col("rules_keep"), 1L).otherwise(0L)).as("n_cls_only"),
        sum(when(!col("cls_keep") && col("rules_keep"), 1L).otherwise(0L)).as("n_rules_only"))
      .withColumn("agree_share",
        (col("n_both") + (col("n_docs") - col("n_keep") - col("n_rules_only")))
          .cast("double") / col("n_docs"))
      .orderBy("theta_milli")
  }

  /** The t28 training run as oracle CTEs — ONE generator for the
    * t28 / t29 / p27 oracles (the rankChainCtes suffix rule: one
    * constant, one text, three keys). Every round CTE is AS
    * MATERIALIZED (the t27 rule: each w_r is referenced by several
    * later CTEs and DuckDB's default inlining re-evaluates the whole
    * prefix per reference). */
  /** The word-frequency base CTE, parameterized by source relation
    * and CTE-name prefix (round 17: p29 composes this chain NEXT TO
    * the t27 epoch chain in one oracle — both use w0..wN names, so
    * the composition prefixes the BPE side; and p29 trains on the
    * corpus slice, so the relation is a filtered subquery). The
    * defaults reproduce the t28/t29/p27/p28 oracles byte-for-byte. */
  private[operators] def bpeTrainW0Of(rel: String = "documents",
                                      pfx: String = ""): String =
    raw"""${pfx}w0 AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
       |    FROM $rel) tw
       |  GROUP BY w)""".stripMargin

  private[operators] val BpeTrainW0: String = bpeTrainW0Of()

  private[operators] def bpeTrainCtes(withTokensAfter: Boolean,
                                      rounds: Int = BpeTrainRounds,
                                      pfx: String = ""): String =
    (1 to rounds).map { r =>
      val sym = bpeTrainSym(r)
      val base =
        s"""${pfx}p$r AS MATERIALIZED (SELECT substr(w, i, 2) AS pair, CAST(SUM(freq) AS BIGINT) AS c
           |  FROM (SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
           |        FROM ${pfx}w${r - 1} WHERE length(w) >= 2) ${pfx}x$r GROUP BY 1),
           |${pfx}a$r AS MATERIALIZED (SELECT pair, c FROM ${pfx}p$r ORDER BY c DESC, pair LIMIT 1),
           |${pfx}w$r AS MATERIALIZED (SELECT replace(w, (SELECT pair FROM ${pfx}a$r), '$sym') AS w, freq FROM ${pfx}w${r - 1})""".stripMargin
      if (withTokensAfter)
        base + s",\n${pfx}n$r AS MATERIALIZED (SELECT CAST(SUM(freq * length(w)) AS BIGINT) AS tokens_after FROM ${pfx}w$r)"
      else base
    }.mkString(",\n")

  /** The trained-table fold of `inner`, each round's pair applied
    * via a scalar subquery over the chain above. */
  private[operators] def bpeTrainedFoldSql(inner: String,
                                           pfx: String = ""): String =
    (1 to BpeTrainRounds).foldLeft(inner) { case (acc, r) =>
      s"replace($acc, (SELECT pair FROM ${pfx}a$r), '${bpeTrainSym(r)}')"
    }

  /** The full t27 pocket-training run as oracle CTEs, parameterized
    * by the training relation (round 17: p29 trains the gate on the
    * corpus slice and serves the arrival slice; t27 trains on the
    * whole table — ONE generator, the bpeTrainW0Of rule, so the two
    * keys cannot drift). Produces dq27 … rows27 / m27 / p27; the
    * pocket epoch's weights are `SELECT f, w FROM rows27 CROSS JOIN
    * p27 WHERE epoch = pe`. Every chain CTE is AS MATERIALIZED: each
    * w_e is referenced by THREE later CTEs (s_{e+1}, w_{e+1}, its
    * epoch row), and DuckDB's default inlining re-evaluates the
    * whole prefix per reference — the un-materialized 8-epoch chain
    * ran for minutes; materialized it reads in ~0.6s (measured). */
  private[operators] def pocketTrainCtes(rel: String = "documents"): String = {
    val epochCtes = (1 to PerceptronEpochs).map { e =>
      s"""s$e AS MATERIALIZED (SELECT feat27.doc_id, CAST(SUM(x * w) AS BIGINT) AS s
         |  FROM feat27 JOIN w${e - 1} USING (f) GROUP BY 1),
         |er$e AS MATERIALIZED (SELECT s$e.doc_id, y FROM s$e JOIN lab27 USING (doc_id)
         |  WHERE (y = 1 AND s < 0) OR (y = -1 AND s >= 0)),
         |u$e AS MATERIALIZED (SELECT f, CAST(SUM(y * x) AS BIGINT) AS dd
         |  FROM feat27 JOIN er$e USING (doc_id) GROUP BY 1),
         |w$e AS MATERIALIZED (SELECT f, w + COALESCE(dd, 0) AS w FROM w${e - 1} LEFT JOIN u$e USING (f)),
         |n$e AS MATERIALIZED (SELECT COUNT(*) AS n_err FROM er$e)""".stripMargin
    }.mkString(",\n")
    // epoch e reports the weights it EVALUATED (w_{e-1}) beside its
    // error count — matching the pocket semantics
    val epochRows = (1 to PerceptronEpochs).map { e =>
      s"SELECT CAST($e AS BIGINT) AS epoch, f, w, n_err FROM w${e - 1} CROSS JOIN n$e"
    }.mkString("\nUNION ALL\n")
    raw"""dq27 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM $rel),
      |meta27 AS MATERIALIZED (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt,
      |  CAST(len(list_filter(t, q -> list_contains(['the','a','of','and','to','in','is'], q))) AS BIGINT) AS nstop
      |  FROM dq27),
      |lab27 AS MATERIALIZED (SELECT doc_id,
      |  CASE WHEN nstop * 12 >= nt THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
      |  FROM meta27),
      |tok27 AS (SELECT doc_id, unnest(t) AS term FROM dq27),
      |v27 AS (SELECT term, row_number() OVER (ORDER BY term) AS tid
      |  FROM (SELECT DISTINCT term FROM tok27) x),
      |feat27 AS MATERIALIZED (SELECT f0.doc_id, f, (cnt * 1000000) // nt AS x FROM
      |  (SELECT doc_id, tid % $ClassifierDim AS f, COUNT(*) AS cnt
      |   FROM tok27 JOIN v27 USING (term) GROUP BY 1, 2) f0
      |  JOIN meta27 ON meta27.doc_id = f0.doc_id),
      |w0 AS (SELECT CAST(unnest(generate_series(0, ${ClassifierDim - 1})) AS BIGINT) AS f,
      |  CAST(0 AS BIGINT) AS w),
      |$epochCtes,
      |rows27 AS MATERIALIZED (
      |$epochRows),
      |m27 AS (SELECT MIN(n_err) AS me FROM (SELECT DISTINCT epoch, n_err FROM rows27) z),
      |p27 AS (SELECT MIN(epoch) AS pe FROM rows27, m27 WHERE n_err = me)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "t28_train_bpe" -> {
      val roundRows = (1 to BpeTrainRounds).map { r =>
        s"SELECT CAST($r AS BIGINT) AS merge_round, pair, '${bpeTrainSym(r)}' AS merged_sym, c AS pair_freq, tokens_after FROM a$r CROSS JOIN n$r"
      }.mkString("\nUNION ALL\n")
      s"""WITH $BpeTrainW0,
         |${bpeTrainCtes(withTokensAfter = true)}
         |$roundRows
         |ORDER BY merge_round""".stripMargin
    },

    "t30_merge_calibration" -> {
      // ONE 24-round chain (the Spark side's single training run);
      // each grid row projects its round's argmax + curve point and
      // divides by the shared round-0 mass — identical exact-integer
      // operands on both engines, so the double ratio matches bitwise
      val gridRows = BpeCalibrationGrid.map { r =>
        s"SELECT CAST($r AS BIGINT) AS merge_round, pair, '${bpeTrainSym(r)}' AS merged_sym, c AS pair_freq, tokens_after, tokens_before, CAST(tokens_after AS DOUBLE) / tokens_before AS compression_ratio FROM a$r CROSS JOIN n$r CROSS JOIN n0"
      }.mkString("\nUNION ALL\n")
      s"""WITH $BpeTrainW0,
         |n0 AS MATERIALIZED (SELECT CAST(SUM(freq * length(w)) AS BIGINT) AS tokens_before FROM w0),
         |${bpeTrainCtes(withTokensAfter = true, rounds = BpeCalibrationGrid.max)}
         |$gridRows
         |ORDER BY merge_round""".stripMargin
    },

    "t31_frozen_tokens" -> {
      // the frozen-serving key's oracle: training is deterministic,
      // so the frozen table == the re-derived chain on the same
      // corpus — the t29 fold minus the fixed-table columns
      val trainedFold = bpeTrainedFoldSql("lower(text)")
      raw"""WITH $BpeTrainW0,
         |${bpeTrainCtes(withTokensAfter = false)}
         |SELECT doc_id,
         |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
         |  CAST(length(regexp_replace($trainedFold, '\s+', '', 'g')) AS BIGINT) AS n_bpe_trained
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "t32_compression_drift" -> {
      // the t28 chain + the t26 regime construction + per-regime
      // folds via scalar subqueries over the chain — ratios divide
      // identical exact integers on both engines
      val foldT = bpeTrainedFoldSql("lower(text)")
      raw"""WITH $BpeTrainW0,
         |${bpeTrainCtes(withTokensAfter = false)},
         |cb AS MATERIALIZED (SELECT
         |    CAST(SUM(length(regexp_replace(lower(text), '\s+', '', 'g'))) AS BIGINT) AS c_before,
         |    CAST(SUM(length(regexp_replace($foldT, '\s+', '', 'g'))) AS BIGINT) AS c_after
         |  FROM documents),
         |base AS (SELECT CAST(c_after AS DOUBLE) / c_before AS corpus_ratio FROM cb),
         |arr AS (
         |  SELECT 'inject' AS regime, 'nv' || CAST(doc_id AS VARCHAR) || ' ' || text AS text
         |  FROM documents WHERE doc_id % 10 = 8
         |  UNION ALL
         |  SELECT 'reverse' AS regime, reverse(text) AS text
         |  FROM documents WHERE doc_id % 10 = 9),
         |ag AS (SELECT regime, COUNT(*) AS n_docs,
         |    CAST(SUM(length(regexp_replace(lower(text), '\s+', '', 'g'))) AS BIGINT) AS tok_before,
         |    CAST(SUM(length(regexp_replace($foldT, '\s+', '', 'g'))) AS BIGINT) AS tok_after
         |  FROM arr GROUP BY 1)
         |SELECT regime, n_docs, tok_before, tok_after,
         |  CAST(tok_after AS DOUBLE) / tok_before AS arrival_ratio,
         |  corpus_ratio,
         |  CAST(tok_after AS DOUBLE) / tok_before - corpus_ratio AS ratio_drift
         |FROM ag CROSS JOIN base ORDER BY regime""".stripMargin
    },

    "t29_trained_tokens" -> {
      // t28's training chain verbatim, then the per-doc fold applies
      // each round's learned pair via a scalar subquery (a constant
      // at execution — the engines fold the tables THEY derived, so
      // the hash gate pins the whole train→apply pipeline)
      val trainedFold = bpeTrainedFoldSql("lower(text)")
      raw"""WITH $BpeTrainW0,
         |${bpeTrainCtes(withTokensAfter = false)}
         |SELECT doc_id,
         |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
         |  CAST(length(regexp_replace($trainedFold, '\s+', '', 'g')) AS BIGINT) AS n_bpe_trained,
         |  CAST(length(regexp_replace(${bpeMergeSql("lower(text)")}, '\s+', '', 'g')) AS BIGINT) AS n_bpe_fixed,
         |  CAST(CAST(length(regexp_replace($trainedFold, '\s+', '', 'g')) AS BIGINT) AS DOUBLE)
         |    / CAST(length(regexp_replace(${bpeMergeSql("lower(text)")}, '\s+', '', 'g')) AS BIGINT) AS trained_per_fixed
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "t27_train_classifier" ->
      raw"""WITH ${pocketTrainCtes()}
        |SELECT epoch, f, w, n_err, epoch = pe AS is_pocket
        |FROM rows27 CROSS JOIN p27
        |ORDER BY epoch, f""".stripMargin,

    "t26_score_drift" ->
      raw"""WITH d AS (SELECT doc_id, text FROM documents),
         |cd AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM d),
         |tok AS (SELECT doc_id, unnest(t) AS term FROM cd),
         |v AS (SELECT term, row_number() OVER (ORDER BY term) AS tid FROM (SELECT DISTINCT term FROM tok) x),
         |cfeat AS (SELECT doc_id, tid % $ClassifierDim AS f, COUNT(*) AS cnt
         |          FROM tok JOIN v USING (term) GROUP BY 1, 2),
         |base AS (SELECT CAST(SUM(cnt * ((1103515245 * (f + 1) + 12345) % 197 - 98)) AS DOUBLE)
         |           / SUM(cnt) AS corpus_margin FROM cfeat),
         |arr AS (
         |  SELECT 'inject' AS regime, doc_id + 1000000 AS doc_id,
         |         'nv' || CAST(doc_id AS VARCHAR) || ' ' || text AS text
         |  FROM d WHERE doc_id % 10 = 8
         |  UNION ALL
         |  SELECT 'reverse' AS regime, doc_id + 2000000 AS doc_id,
         |         reverse(text) AS text
         |  FROM d WHERE doc_id % 10 = 9),
         |atok AS (SELECT regime, doc_id,
         |    unnest(string_split_regex(trim(text), '\s+')) AS term FROM arr),
         |am AS (SELECT regime, COUNT(*) AS n_tok_arr FROM atok GROUP BY 1),
         |an AS (SELECT regime, COUNT(*) AS n_docs FROM arr GROUP BY 1),
         |afeat AS (SELECT regime, doc_id, tid % $ClassifierDim AS f, COUNT(*) AS cnt
         |          FROM atok JOIN v USING (term) GROUP BY 1, 2, 3),
         |acls AS (SELECT regime, doc_id,
         |           CAST(SUM(cnt * ((1103515245 * (f + 1) + 12345) % 197 - 98)) AS BIGINT) AS score,
         |           CAST(SUM(cnt) AS BIGINT) AS n_tokens
         |         FROM afeat GROUP BY 1, 2),
         |ag AS (SELECT regime, COUNT(*) AS n_docs_scored,
         |         CAST(COALESCE(SUM(CASE WHEN score >= 0 THEN 1 END), 0) AS BIGINT) AS n_keep,
         |         CAST(SUM(score) AS BIGINT) AS a_score,
         |         CAST(SUM(n_tokens) AS BIGINT) AS n_tok_scored
         |       FROM acls GROUP BY 1)
         |SELECT ag.regime, n_docs, n_docs_scored, n_keep, n_tok_arr, n_tok_scored,
         |  CAST(n_tok_arr - n_tok_scored AS DOUBLE) / n_tok_arr AS unseen_share,
         |  CASE WHEN n_tok_scored > 0 THEN CAST(a_score AS DOUBLE) / n_tok_scored END AS mean_margin,
         |  corpus_margin,
         |  CASE WHEN n_tok_scored > 0
         |    THEN CAST(a_score AS DOUBLE) / n_tok_scored - corpus_margin END AS margin_drift
         |FROM ag JOIN am USING (regime) JOIN an USING (regime) CROSS JOIN base
         |ORDER BY ag.regime""".stripMargin,

    "t24_gate_calibration" -> {
      val grid = GateThresholdGrid.mkString("(", "), (", ")")
      raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS term FROM d),
         |v AS (SELECT term, row_number() OVER (ORDER BY term) AS tid FROM (SELECT DISTINCT term FROM tok) x),
         |feat AS (SELECT doc_id, tid % $ClassifierDim AS f, COUNT(*) AS cnt
         |         FROM tok JOIN v USING (term) GROUP BY 1, 2),
         |cls AS (SELECT doc_id,
         |          CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |          CAST(SUM(cnt * ((1103515245 * (f + 1) + 12345) % 197 - 98)) AS BIGINT) AS score
         |        FROM feat GROUP BY 1),
         |mq AS (SELECT doc_id, len(t) AS nt, len(list_distinct(t)) AS nd,
         |         len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS nstop
         |       FROM d),
         |qq AS (SELECT doc_id,
         |         0.4 * (CAST(nd AS DOUBLE) / nt) + 0.3 * (1.0 - CAST(nstop AS DOUBLE) / nt) + 0.3 * least(1.0, nt / 100.0) AS quality
         |       FROM mq),
         |pd AS (SELECT cls.doc_id, n_tokens, score, quality >= 0.5 AS rules_keep
         |       FROM cls JOIN qq ON qq.doc_id = cls.doc_id),
         |g AS (SELECT * FROM (VALUES $grid) AS v(theta_milli)),
         |m AS (SELECT theta_milli, doc_id, n_tokens, rules_keep,
         |        score * 1000 >= theta_milli * n_tokens AS cls_keep
         |      FROM pd CROSS JOIN g)
         |SELECT CAST(theta_milli AS BIGINT) AS theta_milli, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN cls_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(SUM(CASE WHEN cls_keep THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
         |  CAST(SUM(CASE WHEN cls_keep AND rules_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |  CAST(SUM(CASE WHEN cls_keep AND NOT rules_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_cls_only,
         |  CAST(SUM(CASE WHEN NOT cls_keep AND rules_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_rules_only,
         |  CAST(SUM(CASE WHEN cls_keep AND rules_keep THEN 1 ELSE 0 END)
         |    + (COUNT(*) - SUM(CASE WHEN cls_keep THEN 1 ELSE 0 END)
         |       - SUM(CASE WHEN NOT cls_keep AND rules_keep THEN 1 ELSE 0 END)) AS DOUBLE)
         |    / COUNT(*) AS agree_share
         |FROM m GROUP BY theta_milli ORDER BY theta_milli""".stripMargin
    },

    "t23_quality_classifier" ->
      raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS term FROM d),
         |v AS (SELECT term, row_number() OVER (ORDER BY term) AS tid FROM (SELECT DISTINCT term FROM tok) x),
         |feat AS (SELECT doc_id, tid % $ClassifierDim AS f, COUNT(*) AS cnt
         |         FROM tok JOIN v USING (term) GROUP BY 1, 2),
         |wc AS (SELECT doc_id, f, cnt,
         |         cnt * ((1103515245 * (f + 1) + 12345) % 197 - 98) AS c FROM feat),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY abs(c) DESC, f) AS rn FROM wc)
         |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(c) AS BIGINT) AS score,
         |  CAST(SUM(c) AS DOUBLE) / SUM(cnt) AS margin,
         |  SUM(c) >= 0 AS keep,
         |  CAST(MAX(CASE WHEN rn = 1 THEN f END) AS BIGINT) AS f1,
         |  CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS c1,
         |  CAST(MAX(CASE WHEN rn = 2 THEN f END) AS BIGINT) AS f2,
         |  CAST(MAX(CASE WHEN rn = 2 THEN c END) AS BIGINT) AS c2,
         |  CAST(MAX(CASE WHEN rn = 3 THEN f END) AS BIGINT) AS f3,
         |  CAST(MAX(CASE WHEN rn = 3 THEN c END) AS BIGINT) AS c3
         |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "qa09_bottomk_sample" ->
      raw"""WITH st AS (SELECT DISTINCT source, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
         |tv AS (SELECT term, ('0x' || substr(md5(term), 1, 15))::BIGINT AS hval
         |       FROM (SELECT DISTINCT term FROM st) t),
         |smp AS (SELECT term, hval FROM tv ORDER BY hval LIMIT $KmvK),
         |rk AS (SELECT a.term AS term, a.hval AS hval, COUNT(*) AS smp_rank
         |       FROM smp a JOIN smp b ON b.hval <= a.hval GROUP BY 1, 2),
         |ps AS (SELECT term, hval FROM (
         |         SELECT st.term, hval,
         |           row_number() OVER (PARTITION BY source ORDER BY hval) AS rn
         |         FROM st JOIN tv USING (term)) x
         |       WHERE rn <= $KmvK),
         |mg AS (SELECT term FROM (SELECT DISTINCT term, hval FROM ps) u
         |       ORDER BY hval LIMIT $KmvK),
         |ex AS (SELECT COUNT(*) AS n_distinct FROM tv),
         |kt AS (SELECT CAST(MAX(hval) AS BIGINT) AS kth, COUNT(*) AS n_sample FROM smp)
         |SELECT smp_rank, rk.term, rk.hval,
         |  rk.term IN (SELECT term FROM mg) AS in_merged,
         |  n_distinct, n_sample,
         |  CASE WHEN n_sample < $KmvK THEN CAST(n_distinct AS DOUBLE)
         |       ELSE $KmvNum / CAST(kth AS DOUBLE) END AS est_distinct
         |FROM rk, ex, kt ORDER BY smp_rank""".stripMargin,

    "qa10_hll_by_source" -> {
      raw"""WITH tk AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
         |ce AS (SELECT source, x % $HllM AS bucket,
         |         55 - (${hllBitlenSql(s"(x // $HllM)")}) AS rk
         |       FROM (SELECT source, ('0x' || substr(md5(term), 1, 15))::BIGINT AS x FROM tk) h),
         |g AS (SELECT source, bucket, MAX(rk) AS max_rank FROM ce GROUP BY source, bucket),
         |ga AS (SELECT source, COUNT(*) AS n_used,
         |         CAST(SUM(${hllPowSql("max_rank")}) AS BIGINT) AS sp FROM g GROUP BY source),
         |ex AS (SELECT source, COUNT(DISTINCT term) AS exact_distinct FROM tk GROUP BY source)
         |SELECT ex.source, exact_distinct, n_used,
         |  sp + ($HllM - n_used) * $HllPow55 AS sum_scaled,
         |  $HllNum / CAST(sp + ($HllM - n_used) * $HllPow55 AS DOUBLE) AS est_raw,
         |  ($HllNum / CAST(sp + ($HllM - n_used) * $HllPow55 AS DOUBLE)) - exact_distinct AS err_abs
         |FROM ex JOIN ga USING (source) ORDER BY source""".stripMargin
    },

    "t17_token_gini" ->
      raw"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
         |c AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term),
         |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    COUNT(*) AS n_types, CAST(SUM(c * c) AS BIGINT) AS sum_sq,
         |    CAST(MAX(c) AS BIGINT) AS max_c
         |  FROM c GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_types, sum_sq,
         |  CAST(n_tokens * n_tokens - sum_sq AS DOUBLE) / (n_tokens * n_tokens) AS gini,
         |  CAST(max_c AS DOUBLE) / n_tokens AS top_share
         |FROM a ORDER BY doc_id""".stripMargin,

    "qa11_cms_width_curve" -> {
      val xmSql = s"('0x' || substr(md5(term), 1, 15))::BIGINT % $CmsP"
      def widthSql(w: Long) = {
        val ctr = CmsHashes.zipWithIndex.map { case ((a, b), j) =>
          s"SELECT $j AS j, (($a * xm + $b) % $CmsP) % $w AS c FROM tx"
        }.mkString("\n   UNION ALL ")
        val pr = CmsHashes.zipWithIndex.map { case ((a, b), j) =>
          s"SELECT term, exact_n, $j AS j, (($a * ($xmSql) + $b) % $CmsP) % $w AS c FROM ex"
        }.mkString("\n   UNION ALL ")
        s"""SELECT $w AS width, p.term, p.exact_n,
           |  MIN(ctr.n) AS cms_est, MIN(ctr.n) - p.exact_n AS overestimate
           |FROM ($pr) p
           |JOIN (SELECT j, c, COUNT(*) AS n FROM ($ctr) t GROUP BY j, c) ctr
           |  USING (j, c)
           |GROUP BY p.term, p.exact_n""".stripMargin
      }
      raw"""WITH tk AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
         |tx AS (SELECT term, $xmSql AS xm FROM tk),
         |ex AS (SELECT term, COUNT(*) AS exact_n FROM tk GROUP BY term
         |       ORDER BY exact_n DESC, term LIMIT 20)
         |${CmsWidthGrid.map(widthSql).mkString("\nUNION ALL\n")}
         |ORDER BY width, exact_n DESC, term""".stripMargin
    },

    "qa07_hll_distinct" -> {
      val xSql = "('0x' || substr(md5(term), 1, 15))::BIGINT"
      raw"""WITH tk AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
         |ce AS (SELECT source, x % $HllM AS bucket,
         |         55 - (${hllBitlenSql(s"(x // $HllM)")}) AS rk
         |       FROM (SELECT source, $xSql AS x FROM tk) h),
         |g AS (SELECT bucket, MAX(rk) AS max_rank FROM ce GROUP BY bucket),
         |mg AS (SELECT bucket, MAX(mr) AS max_rank FROM (
         |         SELECT source, bucket, MAX(rk) AS mr FROM ce GROUP BY source, bucket) ps
         |       GROUP BY bucket),
         |ga AS (SELECT COUNT(*) AS n_used,
         |         CAST(SUM(${hllPowSql("max_rank")}) AS BIGINT) AS sp FROM g),
         |ma AS (SELECT COUNT(*) AS n_used_m,
         |         CAST(SUM(${hllPowSql("max_rank")}) AS BIGINT) AS spm FROM mg),
         |ex AS (SELECT COUNT(DISTINCT term) AS exact_distinct FROM tk)
         |SELECT exact_distinct, n_used, $HllM - n_used AS n_zero,
         |  sp + ($HllM - n_used) * $HllPow55 AS sum_scaled,
         |  spm + ($HllM - n_used_m) * $HllPow55 AS merged_sum_scaled,
         |  $HllNum / CAST(sp + ($HllM - n_used) * $HllPow55 AS DOUBLE) AS est_raw,
         |  ($HllNum / CAST(sp + ($HllM - n_used) * $HllPow55 AS DOUBLE)) - exact_distinct AS err_abs
         |FROM ex, ga, ma""".stripMargin
    },

    "qa06_cms_accuracy" -> {
      val xmSql = s"('0x' || substr(md5(term), 1, 15))::BIGINT % $CmsP"
      val ctrBranches = CmsHashes.zipWithIndex.map { case ((a, b), j) =>
        s"SELECT $j AS j, (($a * xm + $b) % $CmsP) % $CmsWidth AS c FROM tx"
      }.mkString("\n   UNION ALL ")
      val prBranches = CmsHashes.zipWithIndex.map { case ((a, b), j) =>
        s"SELECT term, exact_n, $j AS j, (($a * ($xmSql) + $b) % $CmsP) % $CmsWidth AS c FROM ex"
      }.mkString("\n   UNION ALL ")
      raw"""WITH tk AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
         |tx AS (SELECT term, $xmSql AS xm FROM tk),
         |ctr AS (SELECT j, c, COUNT(*) AS n FROM (
         |   $ctrBranches) t GROUP BY j, c),
         |ex AS (SELECT term, COUNT(*) AS exact_n FROM tk GROUP BY term
         |       ORDER BY exact_n DESC, term LIMIT 20),
         |pr AS (
         |   $prBranches)
         |SELECT p.term, p.exact_n, MIN(ctr.n) AS cms_est,
         |  MIN(ctr.n) - p.exact_n AS overestimate
         |FROM pr p JOIN ctr USING (j, c)
         |GROUP BY p.term, p.exact_n
         |ORDER BY exact_n DESC, term""".stripMargin
    },

    "t16_bpe_tokens" ->
      raw"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
         |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_chars_nospace,
         |  CAST(length(regexp_replace(${bpeMergeSql("lower(text)")}, '\s+', '', 'g')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(CAST(length(regexp_replace(${bpeMergeSql("lower(text)")}, '\s+', '', 'g')) AS BIGINT) AS DOUBLE)
         |    / len(string_split_regex(trim(text), '\s+')) AS bpe_per_word
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t15_lm_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |cf AS (SELECT term, COUNT(*) AS cf FROM tok GROUP BY term),
        |pd AS (SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(cf) AS BIGINT) AS sum_cf
        |       FROM tok JOIN cf USING (term) GROUP BY doc_id),
        |sc AS (SELECT pd.doc_id, lang, n_tokens, sum_cf,
        |    (sum_cf // n_tokens) * 1000000 + ((sum_cf % n_tokens) * 1000000) // n_tokens AS score
        |  FROM pd JOIN documents USING (doc_id)),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS BIGINT) AS lm_rank,
        |    COUNT(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM sc)
        |SELECT doc_id, lang, n_tokens, sum_cf, score, lm_rank,
        |  CASE WHEN lm_rank * 3 <= n_lang THEN 'head'
        |       WHEN lm_rank * 3 <= n_lang * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    "t14_quality_filter" ->
      ("WITH " + TextAnalysis.qualityCtes + """,
        |bi4 AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS term
        |        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |              FROM dq WHERE len(t) >= 2) x),
        |cnt4 AS (SELECT doc_id, term, COUNT(*) AS cnt FROM bi4 GROUP BY doc_id, term),
        |agg4 AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |           CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS dup_inst
        |         FROM cnt4 GROUP BY doc_id),
        |fl AS (SELECT mq.doc_id,
        |    nt < 25 AS too_short,
        |    nstop * 50 < nt AS low_stopword,
        |    (nt - nd) * 100 > nt * 65 AS high_dup,
        |    COALESCE(dup_inst, 0) * 100 > COALESCE(n_bigrams, 0) * 12 AS rep_bigram
        |  FROM mq LEFT JOIN agg4 USING (doc_id))
        |SELECT doc_id, too_short, low_stopword, high_dup, rep_bigram,
        |  CAST((CASE WHEN too_short THEN 1 ELSE 0 END) +
        |       (CASE WHEN low_stopword THEN 1 ELSE 0 END) +
        |       (CASE WHEN high_dup THEN 1 ELSE 0 END) +
        |       (CASE WHEN rep_bigram THEN 1 ELSE 0 END) AS BIGINT) AS n_rules,
        |  ((CASE WHEN too_short THEN 1 ELSE 0 END) +
        |   (CASE WHEN low_stopword THEN 1 ELSE 0 END) +
        |   (CASE WHEN high_dup THEN 1 ELSE 0 END) +
        |   (CASE WHEN rep_bigram THEN 1 ELSE 0 END)) = 0 AS keep,
        |  concat_ws(';',
        |    CASE WHEN too_short THEN 'too_short' END,
        |    CASE WHEN low_stopword THEN 'low_stopword' END,
        |    CASE WHEN high_dup THEN 'high_dup' END,
        |    CASE WHEN rep_bigram THEN 'rep_bigram' END) AS reasons
        |FROM fl ORDER BY doc_id""".stripMargin),

    "t12_char_profile" ->
      """WITH c AS (SELECT doc_id, n_chars, text,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
        |    CAST(length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS BIGINT) AS n_ws
        |  FROM documents)
        |SELECT doc_id, n_chars, n_alpha, n_digit, n_upper, n_ws,
        |  n_chars - n_alpha - n_digit - n_ws AS n_other,
        |  CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
        |  CAST(n_chars - n_alpha - n_digit - n_ws AS DOUBLE) / n_chars AS symbol_ratio,
        |  right(trim(text), 1) IN ('.', '!', '?') AS ends_sentence
        |FROM c ORDER BY doc_id""".stripMargin,

    "t11_bigram_lm" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS term FROM d),
        |cf1 AS (SELECT term, COUNT(*) AS cf1 FROM tok GROUP BY term),
        |bi AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS big
        |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |             FROM d WHERE len(t) >= 2) x),
        |cf2 AS (SELECT big, COUNT(*) AS cf2 FROM bi GROUP BY big)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(COALESCE(SUM(CASE WHEN cf2 = 1 THEN 1 END), 0) AS BIGINT) AS n_novel,
        |  MIN(CAST(cf2 AS DOUBLE) / cf1) AS min_p,
        |  MAX(CAST(cf2 AS DOUBLE) / cf1) AS max_p
        |FROM bi JOIN cf2 USING (big) JOIN cf1 ON cf1.term = bi.w1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t10_vocab_stats" ->
      """WITH tf AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |c AS (SELECT source, term, COUNT(*) AS cf FROM tf GROUP BY 1, 2)
        |SELECT source, CAST(SUM(cf) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  CAST(COALESCE(SUM(CASE WHEN cf = 1 THEN 1 END), 0) AS BIGINT) AS n_hapax,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cf) AS BIGINT) AS type_token_ratio
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "t08_unigram_lm" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |cf AS (SELECT term, COUNT(*) AS cf FROM tok GROUP BY term),
        |tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total_tokens FROM cf),
        |pd AS (SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(cf) AS BIGINT) AS sum_cf
        |       FROM tok JOIN cf USING (term) GROUP BY doc_id)
        |SELECT doc_id, n_tokens, sum_cf,
        |  CAST(sum_cf AS DOUBLE) / n_tokens AS mean_cf,
        |  CAST(sum_cf AS DOUBLE) / n_tokens / total_tokens AS mean_prob
        |FROM pd CROSS JOIN tot ORDER BY doc_id""".stripMargin,

    "t09_rep_ngrams" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |bi AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS term
        |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |             FROM d WHERE len(t) >= 2) x),
        |cnt AS (SELECT doc_id, term, COUNT(*) AS cnt FROM bi GROUP BY doc_id, term),
        |top AS (SELECT doc_id, term AS top_bigram FROM (
        |          SELECT doc_id, term,
        |            row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, term) AS rn
        |          FROM cnt) r WHERE rn = 1),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |          CAST(MAX(cnt) AS BIGINT) AS top_count,
        |          CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS dup_inst
        |        FROM cnt GROUP BY doc_id)
        |SELECT agg.doc_id, n_bigrams, top_count, top_bigram, dup_inst,
        |  CAST(dup_inst AS DOUBLE) / n_bigrams AS dup_share
        |FROM agg JOIN top ON top.doc_id = agg.doc_id
        |ORDER BY agg.doc_id""".stripMargin
  )
}
