package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** t28's in-engine BPE merge induction against a single-machine
  * reference implementation, plus the two facts that let the trained
  * table drop into t16's slot: applying the trained merges through
  * the literal fold reproduces t28's own tokens_after curve, and on
  * the FIXED table the literal fold equals t16's regex fold. */
class BpeTrainSpec extends SparkSpec {

  /** Plain-Scala reference: standard BPE over a word-frequency
    * table — position-based adjacent pair counts weighted by word
    * frequency, argmax by (count desc, pair asc), global leftmost
    * non-overlapping literal replacement with a fresh symbol. */
  private def refTrain(words0: Map[String, Long], rounds: Int)
      : Seq[(Long, String, String, Long, Long)] = {
    var cur = words0
    (1 to rounds).map { r =>
      val pc = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- cur; i <- 0 until w.length - 1)
        pc.updateWith(w.substring(i, i + 2))(o => Some(o.getOrElse(0L) + f))
      val (pair, c) = pc.toSeq.minBy { case (p, n) => (-n, p) }
      val sym = (0xE100 + r).toChar.toString
      cur = cur.map { case (w, f) => (w.replace(pair, sym), f) }
      val tokensAfter = cur.iterator.map { case (w, f) => f * w.length }.sum
      (r.toLong, pair, sym, c, tokensAfter)
    }
  }

  private val fixtureTexts = Seq(
    "the cat sat on the mat and the dog ran",
    "running in the rain in the morning",
    "the engine merges the most frequent pair in order",
    "pairs of letters merge into fresh symbols",
    "the the the in in an an an er er",
    "ingredients and bandages and sandals",
    "Thermal THE The tHe thermostat theory",
    "a bb ccc dddd eeeee ffffff")

  private def docsDf = {
    import spark.implicits._
    fixtureTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def refWords: Map[String, Long] =
    fixtureTexts.flatMap(_.toLowerCase.trim.split("\\s+"))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("trained merges match the plain-Scala BPE reference") {
    val rounds = 8
    val got = Quality.trainBpeFrom(spark, docsDf, rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == refTrain(refWords, rounds))
  }

  test("later rounds merge pairs containing earlier symbols (hierarchical)") {
    val rounds = 8
    val merges = Quality.trainBpeFrom(spark, docsDf, rounds)
      .collect().map(r => (r.getString(1), r.getString(2)))
    // the fixture's 'the'-heavy vocabulary forces at least one rule
    // whose pair references a previously-introduced PUA symbol
    assert(merges.exists { case (pair, _) =>
      pair.exists(c => c >= 0xE101.toChar && c <= 0xE1FF.toChar) })
    // every merge strictly reduces the corpus token mass
    val curve = Quality.trainBpeFrom(spark, docsDf, rounds)
      .collect().map(_.getLong(4))
    assert(curve.zip(curve.tail).forall { case (a, b) => b < a })
  }

  test("folding the TRAINED table reproduces t28's tokens_after curve") {
    val rounds = 6
    val trained = Quality.trainBpeFrom(spark, docsDf, rounds)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val viaFold = docsDf
      .select(Quality.bpeTokenCountWith(trained)(col("text")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val reported = Quality.trainBpeFrom(spark, docsDf, rounds)
      .orderBy(col("merge_round").desc).limit(1)
      .collect()(0).getLong(4)
    assert(viaFold == reported)
  }

  test("t30: the calibration sweep is a prefix-stable projection of one run") {
    // training to max(grid) rounds yields every smaller setting's
    // exact curve as a prefix — round r's argmax depends only on
    // rounds 1..r−1, never on how far training will continue. This
    // is the fact that lets t30 sweep three table sizes with ONE
    // training run instead of three.
    val long = Quality.trainBpeCurve(docsDf, 12)._1
    val short = Quality.trainBpeCurve(docsDf, 5)._1
    assert(long.take(5) == short)
    // and both runs agree on the round-0 mass (the sweep denominator)
    assert(Quality.trainBpeCurve(docsDf, 5)._2 ==
      Quality.trainBpeCurve(docsDf, 12)._2)
  }

  test("t30: compression is strictly monotone over the grid and anchored at round 0") {
    val rows = Quality.t30MergeCalibration(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq ==
      Quality.BpeCalibrationGrid.map(_.toLong))
    // tokens_after strictly decreases as the table grows; every
    // ratio is in (0, 1) and equals its own exact division
    assert(rows.zip(rows.tail).forall { case ((_, a, _, _), (_, b, _, _)) =>
      b < a })
    assert(rows.forall { case (_, after, before, ratio) =>
      after < before && ratio == after.toDouble / before })
  }

  test("t32: the reverse regime drifts, the inject regime stays fresh") {
    // the monitor's discriminating property: known text plus a novel
    // token still compresses (rules fire), a reversed domain does not
    val rows = Quality.t32CompressionDrift(spark, sf)
      .collect().map(r => (r.getString(0), r.getAs[Double]("ratio_drift"))).toMap
    assert(rows("reverse") > 0.05,
      s"the drifted domain must read as compression loss: $rows")
    assert(rows("inject") < rows("reverse") / 2,
      s"in-distribution arrivals must read far fresher: $rows")
  }

  test("fixed table: literal fold == t16's regex fold on the fixture corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    // compare via the public t16 key so the regex fold is the real one
    val t16 = Quality.t16BpeTokens(spark, sf)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val lit16 = docs.select(col("doc_id"),
      Quality.bpeTokenCountWith(Quality.BpeMerges)(col("text")).as("n_lit"))
    val mismatches = t16.join(lit16, "doc_id")
      .filter(col("n_bpe_tokens") =!= col("n_lit")).count()
    assert(mismatches == 0)
  }
}
