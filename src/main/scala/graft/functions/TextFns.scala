package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text/dedup building blocks shared by TextAnalysis, Dedup and
  * Similarity operators.
  *
  * Everything here is pure `Column` algebra (whole-stage codegen) and
  * deliberately restricted to operations DuckDB can replicate
  * bit-for-bit:
  *  - token ids come from a rank-vocabulary (deterministic in any
  *    engine), not an engine-specific hash;
  *  - the minhash/simhash/LSH family is affine-mod arithmetic
  *    `(a_i·x + b_i) mod P` over those ids — exact int64 math.
  *
  * Scale note: the rank vocabulary needs a global sort of the
  * *distinct* term set — at 100 TB that's a large but shuffle-bounded
  * job (distinct terms ≪ corpus). Production callers that don't need
  * cross-engine determinism can swap `vocab` for `xxhash64(term)` and
  * skip the join entirely; every downstream operator only assumes
  * "term → int64 id".
  */
object TextFns {

  val HashP = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles of a token array (1-based element_at,
    * mirroring the oracle's 1-based list indexing). */
  def shingleArray(t: Column, n: Int = 3): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, term) distinct shingle set per document.
    * The token array is projected to an attribute first — inlining
    * `tokens(text)` into the shingle lambda would re-split the text
    * for every element_at reference (O(tokens²) per doc). */
  def docShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingleArray(col("t"), n)).as("term"))
      .distinct()

  /** Rank vocabulary: term → dense 1-based id, ordered by term.
    * Deterministic across engines; see scale note above.
    *
    * The rank is computed WITHOUT a global (unpartitioned) window:
    * terms are bucketed by their 2-char prefix — prefix order is
    * consistent with full lexicographic order, so
    * global_rank(term) = rank_within_bucket(term) + #terms in
    * strictly-smaller buckets. The within-bucket rank is a window
    * partitioned by bucket (parallel), and the per-bucket offsets
    * come from a non-equi self-join over the tiny bucket-count
    * aggregate (≤ a few thousand rows at any corpus size) — no
    * single-partition sort anywhere, identical ids to
    * `row_number() OVER (ORDER BY term)`.
    *
    * The result carries NO broadcast hint: the distinct-shingle set
    * grows roughly linearly with the corpus, so a forced broadcast is
    * a guaranteed OOM at the 100 TB design point. Catalyst broadcasts
    * the term→id join while the vocabulary fits the threshold and
    * falls back to a shuffle join on `term` past it (the same
    * convention as d10's span-df and t08/t11's frequency tables,
    * pinned by NoBroadcastSpec's strategy-flip test on d02). The
    * per-bucket `offsets` table IS hinted — its size is bounded by
    * the 2-char-prefix space, not the corpus. */
  def vocab(terms: DataFrame): DataFrame = {
    val t = terms.select("term").distinct()
      .withColumn("b", substring(col("term"), 1, 2))
    val counts = t.groupBy("b").agg(count(lit(1)).as("cnt"))
    val offsets = counts.select(col("b"), col("cnt")).alias("x")
      .join(broadcast(counts.select(col("b").as("pb"), col("cnt").as("pcnt"))),
        col("pb") < col("x.b"), "left")
      .groupBy(col("x.b").as("b"))
      .agg(coalesce(sum("pcnt"), lit(0L)).as("off"))
    val ranked = t.withColumn("r",
      row_number().over(Window.partitionBy("b").orderBy("term")))
    ranked.join(broadcast(offsets), "b")
      .select(col("term"), (col("off") + col("r")).cast("long").as("tid"))
  }

  /** The affine family's LCG seeds — named ONCE so the Column form
    * below and the native expression's precomputed coefficient
    * tables ([[graft.plans.MinhashSigs]]) derive from the same
    * constants (round-17 review: the expression restated the
    * literals). */
  private[graft] val AffineMulSeed = 1103515245L
  private[graft] val AffineMulOff = 12345L
  private[graft] val AffineAddSeed = 69069L
  private[graft] val AffineAddOff = 1234567L

  /** The i-th family member's exact scalar coefficients (the native
    * expression's precompute path). */
  private[graft] def affineA(i: Int): Long =
    (AffineMulSeed * (i + 1) + AffineMulOff) % HashP
  private[graft] def affineB(i: Int): Long =
    (AffineAddSeed * (i + 1) + AffineAddOff) % HashP

  /** i-th member of the affine hash family applied to id x:
    * ((1103515245(i+1)+12345 mod P) · x + (69069(i+1)+1234567 mod P)) mod P */
  def affineHash(i: Column, x: Column): Column =
    (((lit(AffineMulSeed) * (i + 1) + AffineMulOff) % HashP) * x +
      ((lit(AffineAddSeed) * (i + 1) + AffineAddOff) % HashP)) % HashP

  /** Embedding quantization: float array → exact int64 array at 1e4
    * scale. Float is cast to double *before* scaling so both engines
    * round the same value. Integer dot products / norms built on this
    * are order-independent and bit-exact. */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * 10000).cast("long"))

  /** Exact int64 dot product of two quantized vectors (codegen'd
    * native expression; see [[graft.plans.LongArrayDot]]). */
  def qdot(a: Column, b: Column): Column =
    graft.plans.LongArrayDot(a, b)

  /** Exact int64 squared norm. */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Cosine from exact integer dot/norms — identical double ops in
    * both engines: dot / (sqrt(na) * sqrt(nb)). */
  def qcos(dot: Column, na: Column, nb: Column): Column =
    dot / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
}
