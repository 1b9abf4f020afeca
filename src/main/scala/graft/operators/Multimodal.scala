package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque binary + typed
  * metadata, with decode/feature steps as per-partition batch
  * transforms.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a
  * deterministic stand-in (clearly marked); the Spark-side plumbing —
  * binary columns, schema, partition-wise batching, frame sampling —
  * is real and is what matters at 100 TB: media bytes never leave
  * their partition, metadata travels in columns, and decode is a
  * narrow (shuffle-free) transformation.
  */
object Multimodal {

  /** mm01: typed metadata over a binary media column (here: utf-8
    * document bytes standing in for media blobs): byte length,
    * checksum, stride-sampled "frames". */
  def mm01BinaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("checksum"),
        ceil(col("n_chars") / lit(32.0)).cast("long").as("n_frames"),
        expr("concat_ws('', transform(sequence(1, CAST(ceil(n_chars / 32.0) AS BIGINT)), i -> substring(text, CAST((i - 1) * 32 + 1 AS INT), 1)))")
          .as("frame_sample"))
      .orderBy("doc_id")

  /** mm02: per-(source, modality) media-corpus inventory — item
    * count, byte mass, frame mass, distinct-content count: the
    * capacity-planning aggregate a multimodal dataset build starts
    * with. The testdata carries one real modality, so modality is a
    * deterministic synthetic assignment (doc_id mod 3 → image/audio/
    * video) applied identically in the oracle. One groupBy, all
    * measures map-side combinable except the distinct (two-phase). */
  def mm02ModalityStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")))
      .groupBy("source", "modality")
      .agg(
        count(lit(1)).as("n_items"),
        sum(octet_length(col("text"))).cast("long").as("total_bytes"),
        sum(ceil(col("n_chars") / lit(32.0)).cast("long")).as("total_frames"),
        countDistinct(md5(col("text"))).as("n_distinct"))
      .orderBy("source", "modality")

  /** mm04: frame-level storage dedup — the content-addressed-store
    * measurement over mm03's frame index: every frame payload seen
    * more than once (across or within items), its occurrence/item
    * counts, the canonical (doc, frame) keeper, and the byte mass a
    * CAS blob store would reclaim. Video corpora are dominated by
    * repeated frames (stills, intros, re-uploads) — this is the
    * report that sizes that win.
    *
    * Scale shape: one hash groupBy on the 16-byte frame hash (the
    * keeper argmin is a map-side min(struct), no window); the ≥2
    * filter keeps output to the duplicated subset. */
  def mm04FrameDedup(spark: SparkSession, dir: String): DataFrame =
    mm03From(Tables.documents(spark, dir))
      .groupBy("frame_md5")
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("frame_no"))).as("keep"),
        max(col("frame_len")).as("frame_len")) // constant per hash
      .filter(col("n_occurrences") >= 2)
      .select(col("frame_md5"), col("n_occurrences"), col("n_docs"),
        col("keep.doc_id").as("keep_doc_id"),
        col("keep.frame_no").as("keep_frame_no"),
        ((col("n_occurrences") - 1) * col("frame_len")).as("reclaimable_bytes"))
      .orderBy("frame_md5")

  /** mm03: frame-extraction index — explode each media item into its
    * 32-unit "frames" (the video-pipeline step that turns one blob
    * row into per-frame rows ready for batched decode/embedding):
    * frame number, offset, frame payload hash and length. Units are
    * chars here (== bytes for this ASCII fixture); a binary
    * deployment swaps `substr` for a blob slice, plumbing unchanged.
    * The
    * explode is a narrow transformation — frames stay on their
    * parent's partition, output size is the corpus's frame mass, and
    * downstream per-frame stages (decode, embed, dedup by frame_md5)
    * start from here without reshuffling the bytes. */
  def mm03FrameIndex(spark: SparkSession, dir: String): DataFrame =
    mm03From(Tables.documents(spark, dir)).orderBy("doc_id", "frame_no")

  /** mm03's core over any (doc_id, text, n_chars) frame — UNSORTED:
    * the gate's total order lives only on the mm03 query itself, so
    * compositions (mm04's groupBy, mm06/mm07's windows, Stress
    * replays) don't inherit a useless rangepartitioning Exchange +
    * Sort ahead of their own hash exchange (plan-audited: the
    * trailing orderBy previously leaked one extra shuffle into every
    * consumer). */
  /** The 32-unit slicing shared by the frame index (mm03 family) and
    * the audio windowing (mm08) — one explode+substr algebra, so the
    * video frame grid and the audio window grid cannot drift. */
  private def frameSlices(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        ceil(col("n_chars") / lit(32.0)).cast("long").as("n_frames"))
      .filter(col("n_frames") >= 1) // Spark sequence(1,0) would DESCEND
      .withColumn("frame_no", explode(sequence(lit(1L), col("n_frames"))))
      .select(col("doc_id"), col("frame_no"),
        ((col("frame_no") - 1) * 32).as("byte_off"),
        substring_col(col("text"), (col("frame_no") - 1) * 32 + 1, 32)
          .as("frame_text"))

  private[graft] def mm03From(docs: DataFrame): DataFrame =
    frameSlices(docs)
      .select(col("doc_id"), col("frame_no"), col("byte_off"),
        md5(col("frame_text")).as("frame_md5"),
        length(col("frame_text")).cast("long").as("frame_len"))

  /** mm06: SCENE segmentation over the frame index — the
    * shot-boundary structure a video pipeline derives before it
    * frame-samples (sampling one frame per SCENE beats sampling
    * every Nth frame of a static shot): per media item, the number
    * of scenes (maximal runs of identical consecutive frame
    * payloads), static-frame count (frames equal to their
    * predecessor — the redundancy a scene-aware sampler skips) and
    * the longest static run. Same content-hash proxy for visual
    * identity as mm04; a real pipeline swaps the equality for a
    * perceptual-distance threshold at the same seam.
    *
    * Plan shape: one lag window + one running-sum window, BOTH
    * partitioned by doc_id (frames of one item — bounded by item
    * length, never corpus-wide), then two hash aggregates. Frames
    * stay on their parent's partition end-to-end (mm03's narrow
    * explode), so the whole derivation is one shuffle on doc_id. */
  def mm06SceneIndex(spark: SparkSession, dir: String): DataFrame =
    mm06From(mm03From(Tables.documents(spark, dir)))

  /** The scene labelling shared by mm06 and mm07 — lag boundary +
    * running boundary sum, both partitioned by doc_id (bounded by
    * item length, never corpus-wide). One algebra, two consumers:
    * the per-item report (mm06) and the sample manifest (mm07)
    * cannot disagree on where a scene starts. */
  private def sceneFlagged(frames: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_no")
    frames
      .withColumn("prev", lag(col("frame_md5"), 1).over(w))
      .withColumn("boundary",
        (col("prev").isNull || col("prev") =!= col("frame_md5")).cast("long"))
      .withColumn("scene_no", sum(col("boundary")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
  }

  /** mm06's core over any (doc_id, frame_no, frame_md5) frame —
    * MultimodalSpec drives it with constructed static/alternating
    * payloads where the fixture's frames are all-distinct. */
  private[graft] def mm06From(frames: DataFrame): DataFrame = {
    val scenes = sceneFlagged(frames).groupBy("doc_id", "scene_no")
      .agg(count(lit(1)).as("scene_len"))
    scenes.groupBy("doc_id")
      .agg(sum(col("scene_len")).as("n_frames"),
        count(lit(1)).as("n_scenes"),
        (sum(col("scene_len")) - count(lit(1))).as("n_static"),
        max(col("scene_len")).as("longest_scene"))
      .orderBy("doc_id")
  }

  /** mm07: SCENE-AWARE frame sampling — the manifest mm06's report
    * motivates: keep the FIRST frame of every scene (the scene
    * representative) and skip the static remainder, so a decode/
    * embed stage fetches n_scenes frames instead of n_frames. Each
    * kept row carries its fetch coordinates (frame_no, byte_off,
    * frame_md5), the run it represents (scene_len) and the frames it
    * saves (scene_len − 1). Coverage is EXACT by construction —
    * every distinct payload in an item heads at least one of its
    * scenes, so the sampled set covers the item's full distinct
    * payload set (spec-pinned) — the property naive every-Nth
    * sampling lacks (a static doc yields n/N identical fetches while
    * a fast-cut doc gets scenes skipped).
    *
    * Plan shape: the shared sceneFlagged windows plus one more
    * window count over (doc_id, scene_no) — hash partitioning on
    * doc_id already clusters (doc_id, scene_no), so Catalyst adds a
    * sort but NO new exchange: one shuffle end-to-end from mm03's
    * narrow explode, same as mm06. */
  def mm07SceneSample(spark: SparkSession, dir: String): DataFrame =
    mm07From(mm03From(Tables.documents(spark, dir)))

  /** mm07's core over any (doc_id, frame_no, byte_off, frame_md5)
    * frame index. */
  private[graft] def mm07From(frames: DataFrame): DataFrame = {
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "scene_no")
    sceneFlagged(frames)
      .withColumn("scene_len", count(lit(1)).over(wl))
      .filter(col("boundary") === 1)
      .select(col("doc_id"), col("scene_no"), col("frame_no"),
        col("byte_off"), col("frame_md5"), col("scene_len"),
        (col("scene_len") - 1).as("saved_frames"))
      .orderBy("doc_id", "scene_no")
  }

  /** mm08: SILENCE segmentation over windowed audio energy — the
    * audio twin of mm06/mm07's scene structure, closing the
    * modality symmetry: per clip (the doc_id % 3 == 1 audio slice,
    * mm02's convention), 32-sample windows (the SAME frameSlices
    * grid as the video frame index) are scored by exact integer
    * energy (Σ byte², mm05's bytes-as-samples rule) and classified
    * silent when mean-square ≤ 33² — whitespace/control-only windows
    * on this fixture, real silence at a deployment's PCM threshold.
    * Maximal runs of equal classification then segment the clip
    * (speech/silence alternation) via the run-length algebra mm06
    * uses for scenes: a VAD-shaped derivation (trim silence, count
    * utterances, find the longest gap) with every decision in exact
    * int64 and the one float a single division.
    *
    * Plan shape: narrow explode + per-window lambda fold, one lag +
    * one running-sum window partitioned by doc_id (bounded by clip
    * length), two hash aggregates — one shuffle end-to-end, same as
    * mm06. */
  def mm08SilenceSegments(spark: SparkSession, dir: String): DataFrame =
    mm08From(Tables.documents(spark, dir).filter(col("doc_id") % 3 === 1))

  /** mm08's core over any (doc_id, text, n_chars) clip frame —
    * Round8Spec drives constructed speech/silence alternations. */
  private[graft] def mm08From(clips: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_no")
    val scored = frameSlices(clips)
      .select(col("doc_id"), col("frame_no"),
        length(col("frame_text")).cast("long").as("window_len"),
        aggregate(split(col("frame_text"), ""), lit(0L),
          (a, c) => a + ascii(c) * ascii(c)).as("sq_sum"))
      .withColumn("is_silence", col("sq_sum") <= col("window_len") * 1089L)
    val segmented = scored
      .withColumn("prev", lag(col("is_silence"), 1).over(w))
      .withColumn("boundary",
        (col("prev").isNull || col("prev") =!= col("is_silence")).cast("long"))
      .withColumn("seg_no", sum(col("boundary")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val segs = segmented.groupBy("doc_id", "seg_no", "is_silence")
      .agg(count(lit(1)).as("seg_len"))
    segs.groupBy("doc_id")
      .agg(sum(col("seg_len")).as("n_windows"),
        sum(when(col("is_silence"), col("seg_len")).otherwise(0L))
          .as("n_silence_windows"),
        count(lit(1)).as("n_segments"),
        sum(when(col("is_silence"), 1L).otherwise(0L)).as("n_silence_segments"),
        max(when(col("is_silence"), col("seg_len")).otherwise(0L))
          .as("longest_silence"))
      .withColumn("speech_ratio",
        (col("n_windows") - col("n_silence_windows")).cast("double") /
          col("n_windows"))
      .orderBy("doc_id")
  }

  /** `substring` with a Column start (the functions.substring overload
    * takes only literal ints). */
  private def substring_col(str: org.apache.spark.sql.Column,
                            pos: org.apache.spark.sql.Column,
                            len: Int): org.apache.spark.sql.Column =
    substr(str, pos.cast("int"), lit(len))

  /** Decoded-media record produced by the (stubbed) decoder. */
  case class DecodedMedia(docId: Long, width: Int, height: Int,
                          nFrames: Int, meanLuma: Double)

  /** Deterministic fake decode — the fast TEST DOUBLE for pipelines
    * whose fixtures aren't real media (this repo's documents-as-blobs
    * tables). Derives pseudo dimensions/luma from the bytes so tests
    * are stable. Production media goes through [[imageDecode]]; both
    * share the [[decodeBatch]] plumbing. */
  def fakeDecode(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    DecodedMedia(id, 16 + (n % 64), 16 + ((n / 64) % 64),
      1 + (n / 32), if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** REAL image decode on the pure JDK (`javax.imageio` — PNG, BMP
    * and GIF readers ship in every JRE, no external codec needed):
    * width/height from the decoded raster, meanLuma = Rec.601 luma
    * (0.299 R + 0.587 G + 0.114 B) averaged over every pixel,
    * n_frames = 1 (still image). This is the production slot of the
    * [[decodeBatch]] seam — the plumbing (binary column in, typed
    * row out, bytes never leave their partition) is identical to the
    * fake's, so swapping decoders is a one-argument change.
    * Undecodable bytes fail loudly (a silent zero row would poison
    * downstream stats); a lenient pipeline filters/flags upstream. */
  def imageDecode(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image bytes for id=$id (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    DecodedMedia(id, w, h, 1, sum / (w.toLong * h))
  }

  /** A resized image row: the re-encoded PNG bytes plus the new
    * geometry — what a thumbnail/feature-extraction stage emits. */
  case class ResizedMedia(id: Long, png: Array[Byte], width: Int, height: Int)

  /** REAL image RESIZE on the pure JDK, fully DETERMINISTIC:
    * nearest-neighbor sampling by exact integer math (src pixel of
    * target (x, y) = (x·w div tw, y·h div th)) into a fresh RGB
    * raster, re-encoded as PNG via `javax.imageio`. Deliberately NOT
    * `Graphics2D.drawImage` interpolation — rendering-pipeline
    * output can vary across JDK builds, and a training pipeline
    * wants byte-stable artifacts (the engine's determinism rule
    * applied to pixels). Block-constant images resize losslessly
    * (every sampled pixel hits its block — MultimodalSpec pins exact
    * pixel equality both down and up); production smoothing belongs
    * in a model-side transform, not the data plumbing. Same seam as
    * [[imageDecode]]: bytes in, typed row out, loud failure on
    * undecodable input. */
  def imageResize(id: Long, bytes: Array[Byte], tw: Int, th: Int): ResizedMedia = {
    require(tw > 0 && th > 0, s"bad target geometry ${tw}x$th for id=$id")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image bytes for id=$id (${bytes.length} bytes)")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, img.getRGB((x.toLong * w / tw).toInt, sy))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    ResizedMedia(id, bos.toByteArray, tw, th)
  }

  /** Batch resize over a binary media column — the [[decodeBatch]]
    * plumbing with the resize slot: bytes stay on their partition,
    * output carries the re-encoded PNGs (write them with the
    * pipeline's ship step or feed [[imageAHash]]/[[imageDecode]]
    * downstream). */
  def resizeBatch(media: DataFrame, tw: Int, th: Int,
                  idCol: String = "doc_id",
                  binCol: String = "media"): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => imageResize(id, bytes, tw, th) }
      }
  }

  /** mm09: perceptual average-hash (aHash) over the media byte
    * stream, computed RELATIONALLY so the whole hash is
    * oracle-checkable (the mm05 rule): the byte sequence is split
    * into 64 equal blocks (block = pos·64 div n — the 1-D analog of
    * the 8×8 pixel grid), bit b = block-b mean > global mean decided
    * by EXACT integer cross-multiplication (s_b·n_total >
    * s_total·n_b), and the 64 bits assemble into two 32-bit halves
    * (h_hi, h_lo) — two signed longs, so bit 63 never touches the
    * sign bit under ANSI arithmetic. Real images go through
    * [[imageAHash]] (same grid over decoded luma) and the SAME
    * [[phashPairs]] candidate machinery — the fixture text-bytes are
    * too far apart for hamming ≤ 3 (measured sf0.01: nearest pair
    * 10), so the pair join is exercised by the PNG spec, the hash
    * algebra by the driver gate.
    *
    * Scale shape: one generator explode (char mass, the t-family
    * class) feeding two hash groupBys on (doc, block) then (doc);
    * output is one row per doc. */
  def mm09Phash(spark: SparkSession, dir: String): DataFrame =
    mm09From(Tables.documents(spark, dir))

  /** mm09's core over any (doc_id, text) frame — also driven at
    * replicated scale by [[graft.Stress]]. */
  private[graft] def mm09From(documents: DataFrame): DataFrame =
    aHashRelational(documents)
      .select(col("doc_id"), col("h_hi"), col("h_lo"),
        (bit_count(col("h_hi")) + bit_count(col("h_lo"))).cast("long").as("n_bits_set"))
      .orderBy("doc_id")

  /** The RELATIONAL byte-block aHash — mm09's algebra factored to a
    * bare (doc_id, h_hi, h_lo) frame so [[mm11IncrementalMatch]] can
    * hash the corpus and the arrival sides through ONE definition
    * (the shared-algebra rule: the match's semantics are only as
    * oracle-gated as both sides hashing identically). */
  private[graft] def aHashRelational(documents: DataFrame): DataFrame = {
    val d = documents
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
      .filter(col("n") >= 1)
    val ch = d.select(col("doc_id"), col("n"), col("text"),
        explode(sequence(lit(0L), col("n") - 1)).as("pos"))
      .select(col("doc_id"), col("n"),
        expr("(pos * 64) div n").as("b"),
        ascii(expr("substr(text, cast(pos + 1 as int), 1)")).cast("long").as("code"))
    // ≤64 rows/doc, branching into totals + the bit join — cache so
    // the char-mass explode runs once (the qa08 quantized-corpus
    // cache class)
    val blk = OpCache.cached(ch.groupBy("doc_id", "b")
      .agg(sum(col("code")).as("s"), count(lit(1)).as("nb")))
    val tot = blk.groupBy("doc_id")
      .agg(sum(col("s")).as("st"), sum(col("nb")).as("nt"))
    // the cross-multiply rides DECIMAL(38,0) (HUGEINT in the oracle):
    // s·nt grows ~code·n² and would pass int64 near 2.5 GB of text —
    // wrapped-silent in non-ANSI Spark, errored in DuckDB; 128-bit
    // operands keep both engines exact to astronomically large media
    val d38 = "decimal(38,0)"
    blk.join(tot, "doc_id")
      .select(col("doc_id"), col("b"),
        when(col("s").cast(d38) * col("nt").cast(d38) >
            col("st").cast(d38) * col("nb").cast(d38), 1L)
          .otherwise(0L).as("bit"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("b") >= 32,
            col("bit") * expr("shiftleft(cast(1 as bigint), cast(b - 32 as int))"))
          .otherwise(0L)).as("h_hi"),
        sum(when(col("b") < 32,
            col("bit") * expr("shiftleft(cast(1 as bigint), cast(b as int))"))
          .otherwise(0L)).as("h_lo"))
  }

  /** Near-dup pairs over a (doc_id, h_hi, h_lo) hash frame: banded
    * candidates (4 bands of 16 bits — pigeonhole: hamming ≤ 3 over
    * 4 bands leaves at least one band identical, so the band join
    * misses nothing at the default threshold) verified by exact
    * popcount hamming. The d03 simhash machinery applied to
    * perceptual image hashes.
    *
    * DEGENERATE-INPUT caveat (ADVICE r8): blank/uniform media all
    * aHash to the SAME value (every block mean equals the global
    * mean ⟹ all bits 0), so one band value can collect a corpus-
    * scale bucket and the self-join goes quadratic in that count —
    * likelier for image aHash than for d03's text simhash. Two
    * defenses, in preference order: (1) run EXACT dedup first
    * (mm04's frame hash / d01 — identical media are exact dups, not
    * a perceptual-similarity question; the d20 dedup-first rule),
    * after which surviving same-hash mass is small; (2) for corpora
    * where near-identical-but-not-equal blanks still flood a bucket,
    * pass `maxBandOccupancy` > 0 to DROP band buckets above the
    * cutoff before the self-join (the d20 df≤50 screen shape —
    * bounds fan-out to ≤cutoff docs/bucket at any corpus size). The
    * cap deliberately defaults OFF because it trades the pigeonhole
    * exactness guarantee for boundedness: pairs whose ONLY matching
    * band was capped are missed (spec-pinned in MultimodalSpec). */
  /** The 4×16-bit band rows of a (doc_id, h_hi, h_lo) hash frame —
    * ONE definition shared by the self-join pair path
    * ([[phashPairs]]) and the arrival-vs-corpus match path
    * ([[crossMatch]] / the frozen media index): the pigeonhole
    * exactness argument holds only while both sides band
    * identically. */
  private[graft] def bandRows(hashes: DataFrame): DataFrame = {
    val bandStructs = array(
      struct(lit(0).as("band"), shiftright(col("h_hi"), 16).as("bandval")),
      struct(lit(1).as("band"), col("h_hi").bitwiseAND(lit(0xffffL)).as("bandval")),
      struct(lit(2).as("band"), shiftright(col("h_lo"), 16).as("bandval")),
      struct(lit(3).as("band"), col("h_lo").bitwiseAND(lit(0xffffL)).as("bandval")))
    hashes.select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bandval").as("bandval"))
  }

  def phashPairs(hashes: DataFrame, maxHamming: Int = 3,
                 maxBandOccupancy: Long = 0L): DataFrame = {
    require(maxHamming <= 3, "4x16 banding is exact only for hamming <= 3")
    val bb0 = bandRows(hashes)
    // optional hot-bucket screen: one map-side-combinable groupBy on
    // the band key, hint-free join back (the bucket-frequency frame
    // is corpus-derived — Catalyst broadcasts it while it fits)
    val bb =
      if (maxBandOccupancy <= 0) bb0
      else bb0.join(
        bb0.groupBy("band", "bandval").agg(count(lit(1)).as("occ"))
          .filter(col("occ") <= maxBandOccupancy)
          .select(col("band"), col("bandval")),
        Seq("band", "bandval"), "left_semi")
    val cand = bb.as("a").join(bb.as("b"),
        col("a.band") === col("b.band") && col("a.bandval") === col("b.bandval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val ha = hashes.select(col("doc_id").as("doc_a"),
      col("h_hi").as("hi_a"), col("h_lo").as("lo_a"))
    val hb = hashes.select(col("doc_id").as("doc_b"),
      col("h_hi").as("hi_b"), col("h_lo").as("lo_b"))
    cand.join(ha, "doc_a").join(hb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** ARRIVAL-vs-CORPUS banded match — the incremental twin of
    * [[phashPairs]]' self-join (the d15/d19 incremental rule applied
    * to perceptual hashes): arriving media hashes are matched against
    * a corpus-side hash frame through the SAME 4×16 banding
    * ([[bandRows]] — pigeonhole-exact at hamming ≤ 3) and the same
    * exact popcount verify, producing (doc_id, match_id, hamming)
    * with the arrival on the left. Cost is O(arrivals × bucket
    * occupancy), never a corpus self-join: the arrival side is
    * batch-scaled, so Catalyst broadcasts it against the corpus band
    * scan (hint-free — it shuffles on the band key only if a batch
    * outgrows a broadcast). `maxBandOccupancy` caps CORPUS-side
    * bucket fan-out (the phashPairs blank-media defense; capped
    * buckets trade pigeonhole exactness for boundedness, same
    * contract). This is the live algebra behind the frozen media
    * index ([[graft.sources.MediaIndexStore]]) and its streaming
    * twin — one definition for all three read paths. */
  def crossMatch(arrivals: DataFrame, corpus: DataFrame,
                 maxHamming: Int = 3,
                 maxBandOccupancy: Long = 0L): DataFrame =
    matchAgainst(arrivals, cappedBands(corpus, maxBandOccupancy), corpus,
      maxHamming)

  /** The corpus band rows with the optional hot-bucket cap applied —
    * ALSO the frozen media index's persisted band component
    * ([[graft.sources.MediaIndexStore.freeze]] bakes the cap at
    * freeze time, the frozen-index rule: verdicts never shift as
    * arrivals come). */
  private[graft] def cappedBands(corpus: DataFrame,
                                 maxBandOccupancy: Long): DataFrame = {
    val cb0 = bandRows(corpus)
    if (maxBandOccupancy <= 0) cb0
    else cb0.join(
      cb0.groupBy("band", "bandval").agg(count(lit(1)).as("occ"))
        .filter(col("occ") <= maxBandOccupancy)
        .select(col("band"), col("bandval")),
      Seq("band", "bandval"), "left_semi")
  }

  /** The match core over an already-banded corpus side — the ONE
    * definition the live path ([[crossMatch]]), the frozen path
    * ([[graft.sources.MediaIndexStore.matchFrozen]]) and its
    * streaming twin all execute; the frozen==live row equality is
    * structural, not re-proven (the BloomStream shared-algebra
    * rule). */
  private[graft] def matchAgainst(arrivals: DataFrame, corpBands: DataFrame,
      corpus: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4x16 banding is exact only for hamming <= 3")
    // cached: the arrival frame feeds TWO join branches (band probe +
    // popcount verify) and gets no cross-branch reuse — when arrivals
    // are the mm11 decode+hash pipeline, the uncached plan decodes
    // every arriving image TWICE (round-15 profile pass: the dual
    // decode is most of the gap between the mm11_frozen_match bench
    // reads and its band). The frame is batch-scaled (3 longs/row) —
    // exactly the cache's bounded admission class.
    val arr = OpCache.cached(arrivals)
    val ab = bandRows(arr)
    val cand = ab.as("a").join(corpBands.as("c"),
        col("a.band") === col("c.band") && col("a.bandval") === col("c.bandval"))
      .select(col("a.doc_id").as("doc_id"), col("c.doc_id").as("match_id"))
      .distinct()
    val ha = arr.select(col("doc_id"),
      col("h_hi").as("hi_a"), col("h_lo").as("lo_a"))
    val hc = corpus.select(col("doc_id").as("match_id"),
      col("h_hi").as("hi_c"), col("h_lo").as("lo_c"))
    cand.join(ha, "doc_id").join(hc, "match_id")
      .select(col("doc_id"), col("match_id"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_c"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_c")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** mm11: INCREMENTAL MEDIA MATCH — re-encoded copies arrive and
    * must be matched back to their corpus originals (the production
    * read path of media dedup: d15's increment-vs-frozen-corpus
    * shape on mm09's perceptual hashes). The fixture's texts sit
    * ≥ 10 hamming apart (measured — no natural ≤ 3 pairs), so the
    * arrival stream is DERIVED deterministically: each doc_id % 10
    * ∈ {8,9} document arrives re-encoded (its first 4 bytes
    * overwritten — the lossy-transcode analog) under a fresh id
    * (+1,000,000). Both engines derive the identical arrivals, hash
    * both sides through the one [[aHashRelational]] algebra, and
    * match via [[crossMatch]]: most arrivals land within hamming ≤ 3
    * of exactly their original (94/100 at sf0.01); the rest
    * correctly fall outside the gate (a transcode CAN destroy a
    * perceptual match — the monitor-worthy residue). The frozen
    * twin ([[graft.sources.MediaIndexStore]]) answers this same
    * query without re-hashing the corpus; MediaShipSpec pins the
    * row-for-row equality. */
  def mm11IncrementalMatch(spark: SparkSession, dir: String): DataFrame = {
    val (arr, corp) = incrementalSides(spark, dir)
    crossMatch(arr, corp).orderBy("doc_id", "match_id")
  }

  /** The mm11/mm12 fixture sides — corpus = every doc's relational
    * aHash, arrivals = the derived re-encoded copies (see
    * [[mm11IncrementalMatch]]); ONE definition so the match and its
    * staleness monitor grade the same stream. */
  private def incrementalSides(spark: SparkSession,
                               dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 8)
    val arrDocs = docs.filter(col("doc_id") % 10 >= 8)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("~~~~"), expr("substr(text, 5)")).as("text"))
    (aHashRelational(arrDocs), aHashRelational(docs))
  }

  /** mm12: BAND-DRIFT staleness monitor for the media-hash index —
    * qa04's role (WHEN to re-freeze) for the media family: per band
    * of the 4×16 LSH banding, how well the FROZEN corpus's bucket
    * population still covers what arrives. Signals a deployment
    * schedules a re-freeze (and re-bake of the hot-bucket cap) on:
    *
    *  - `n_new_buckets` / falling `hit_share`: arrival band values
    *    unseen in the corpus — those arrivals cannot candidate-join
    *    at all, so the index no longer covers arriving content (the
    *    match's recall proxy, measured WITHOUT ground truth);
    *  - `max_corp_occ`: the hottest corpus bucket — the cap-tuning
    *    input (a growing hot bucket is the phashPairs degenerate-
    *    media flood forming).
    *
    * All decision columns are exact integers (counts); `hit_share`
    * is ONE division of exact counts (oracle-identical doubles).
    * Scale shape: two map-side-combinable bucket aggregates, one
    * bucket-bounded left join, 4 output rows at any corpus size. */
  def mm12BandDrift(spark: SparkSession, dir: String): DataFrame = {
    val (arr, corp) = incrementalSides(spark, dir)
    mm12From(arr, corp)
  }

  /** mm12's core over any arrival/corpus (doc_id, h_hi, h_lo) hash
    * frames — PropertySpec injects a novel-content batch to show the
    * drift signals move (the qa04From pattern). */
  private[graft] def mm12From(arr: DataFrame, corp: DataFrame): DataFrame = {
    val cbo = bandRows(corp).groupBy("band", "bandval")
      .agg(count(lit(1)).as("occ"))
    val abo = bandRows(arr).groupBy("band", "bandval")
      .agg(count(lit(1)).as("n"))
    val cagg = cbo.groupBy("band")
      .agg(count(lit(1)).as("n_corp_buckets"), max(col("occ")).as("max_corp_occ"))
    val aagg = abo
      .join(cbo.select(col("band"), col("bandval"), lit(1L).as("hit")),
        Seq("band", "bandval"), "left")
      .groupBy("band")
      .agg(count(lit(1)).as("n_arr_buckets"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_new_buckets"),
        sum(col("n")).as("n_arr_rows"),
        sum(when(col("hit").isNotNull, col("n")).otherwise(0L)).as("n_arr_hit"))
    cagg.join(aagg, "band")
      .select(col("band").cast("long").as("band"),
        col("n_corp_buckets"), col("max_corp_occ"),
        col("n_arr_buckets"), col("n_new_buckets"),
        col("n_arr_rows"), col("n_arr_hit"),
        (col("n_arr_hit").cast("double") / col("n_arr_rows")).as("hit_share"))
      .orderBy("band")
  }

  /** The media E2E pipeline (VERDICT r9 #3 / r10 #4) — the three
    * real-decode stages composed the way a media dedup deployment
    * runs them: normalize ([[imageResize]] every image to one
    * tw×th geometry, so hashes compare like for like), perceptual-
    * hash ([[imageAHash]]'s 8×8 luma grid over the RESIZED pixels),
    * then [[phashPairs]]' banded candidate join + exact hamming
    * verify. Bytes never leave their partition until the hash
    * reduces each image to two longs — the only shuffled data is
    * (doc_id, h_hi, h_lo) band rows, so the pipeline's shuffle mass
    * is corpus-COUNT-scaled, never corpus-BYTE-scaled (the property
    * that matters at 100 TB of media). `maxBandOccupancy` passes
    * through to the hot-bucket screen (blank/uniform media all hash
    * identically — the d20-style cap bounds that bucket's fan-out).
    * MultimodalSpec pins stage-composition equality + pair
    * semantics; the bench drives it over a rendered PNG corpus. */
  def mediaPipeline(media: DataFrame, tw: Int = 32, th: Int = 32,
                    maxHamming: Int = 3, maxBandOccupancy: Long = 0L,
                    idCol: String = "doc_id",
                    binCol: String = "media"): DataFrame =
    // decode ONCE per call (round 16 — the mm11 dual-decode finding's
    // bigger sibling, root-caused by a ProfilePasses read: phashPairs
    // references its hash frame FIVE times — the band self-join's two
    // sides plus both exact-verify joins — and exchange reuse does
    // not reliably dedup them, so the 5000-image imageio decode ran
    // multiple times per invocation, ~2.0s vs the 1.37s band. The
    // lazy local checkpoint materializes the three-longs-per-image
    // hash frame on the first action and every branch reads the
    // blocks; each CALL still pays exactly one decode, keeping the
    // entry's E2E attribution honest. Block lifetime: nothing
    // downstream can release this frame eagerly — the pair frame is
    // returned lazily — so the blocks stay pinned until the driver
    // GCs the plan and ContextCleaner unpersists asynchronously;
    // they are count-scaled (three longs per image, never bytes), so
    // a long-lived session tolerates that. A caller that fully
    // materializes the pairs and wants the blocks back NOW can run
    // the two stages itself and pass the checkpointed hash frame to
    // Components.releaseCheckpoint after the action.)
    phashPairs(mediaHashes(media, tw, th, idCol, binCol)
        .localCheckpoint(false),
      maxHamming, maxBandOccupancy)

  /** The normalize→hash front half of [[mediaPipeline]] factored out
    * — each (id, bytes) image reduced to (doc_id, h_hi, h_lo) inside
    * its partition (bytes never shuffle). ONE definition for the
    * batch pipeline, the media-index freeze
    * ([[graft.sources.MediaIndexStore]]) and the streaming match
    * ([[graft.streaming.MediaStream]]): frozen and arriving media
    * hash identically by construction. */
  def mediaHashes(media: DataFrame, tw: Int = 32, th: Int = 32,
                  idCol: String = "doc_id",
                  binCol: String = "media"): DataFrame = {
    import media.sparkSession.implicits._
    resizeBatch(media, tw, th, idCol, binCol)
      .mapPartitions(rows => rows.map(r => imageAHash(r.id, r.png)))
      .toDF("doc_id", "h_hi", "h_lo")
  }

  /** Deterministic synthetic PNG corpus for the media-pipeline bench
    * (documents have no real image bytes): one 64×64 PNG per doc_id,
    * pixel pattern keyed by the doc's GROUP (doc_id div 8) with a
    * per-doc single-block perturbation — so each 8-doc group is a
    * near-dup family the pipeline must pair (aHash hamming small
    * within a group, far between groups), and band buckets stay
    * bounded at the family size. Rendering is mapPartitions over ids
    * only; run it UNTIMED at bench prepare. */
  def syntheticPngCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread the id stream across the session's cores BEFORE
    // rendering: the documents fixture is one row group, and without
    // this the corpus lands as ONE parquet file — which then binds
    // every downstream decode stage (mm10's pipeline, mm11's freeze
    // and match) to a single core — a one-file layout no real media
    // corpus ever ships with (measured: mm10 4.1s starved → 3.4s)
    Tables.spreadSmallScan(
        Tables.documents(spark, dir).select(col("doc_id")), col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val group = id / 8
          val variant = (id % 8).toInt
          // high-contrast CELL-level pattern (the aHash fixture
          // class): each 8×8 cell wholly bright or dark, chosen by a
          // mixed hash of (group, cell) — per-pixel noise would park
          // every cell mean at the global mean and make the hash a
          // coin flip, letting cross-family pairs slip under the
          // hamming gate
          // full murmur3 finalizer, decided on HIGH bits: the low
          // bits of one odd multiply are a bijection of the INPUT's
          // low bits (cell alone would decide the pattern and every
          // family would collide)
          def mix(x0: Long): Long = {
            var x = x0
            x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
            x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
            x ^= x >>> 33
            x
          }
          val img = new java.awt.image.BufferedImage(64, 64,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 64) {
            var x = 0
            while (x < 64) {
              val cell = (y / 8) * 8 + (x / 8)
              val on = ((mix(group * 64L + cell) >>> 32) & 7L) < 4L
              val v = if (on) 230 else 20
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          // perturb ONE 8x8 cell per variant to white: flips at most
          // that cell's bit (+ a <4-luma global-mean nudge no 230/20
          // cell sits near), keeping the family within hamming <= 2
          if (variant > 0) {
            val cx = (variant % 8) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                img.setRGB(cx + xx, yy, 0xffffff)
                xx += 1
              }
              yy += 1
            }
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "media")
  }

  /** Real-pixel aHash: the 8×8 average-luma grid over a decoded
    * image ([[imageDecode]]'s javax.imageio path), bit = cell mean >
    * global mean, packed as (h_hi, h_lo) — the image twin of
    * [[mm09Phash]]'s byte-stream hash, sharing [[phashPairs]]. */
  def imageAHash(id: Long, bytes: Array[Byte]): (Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image bytes for id=$id (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        val cell = (y.toLong * 8 / h).toInt * 8 + (x.toLong * 8 / w).toInt
        sums(cell) += luma
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    val means = (0 until 64).map(i => if (cnts(i) == 0) 0.0 else sums(i) / cnts(i))
    val live = (0 until 64).filter(cnts(_) > 0)
    val global = live.map(means).sum / live.length
    var hi = 0L
    var lo = 0L
    (0 until 64).foreach { b =>
      if (cnts(b) > 0 && means(b) > global) {
        if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
      }
    }
    (id, hi, lo)
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Partition-wise media decode: (id, binary) → typed features.
    * `mapPartitions` keeps the heavy bytes on their partition and
    * amortises per-batch decoder setup — the Scala analog of a
    * Pandas-UDF-over-mapInPandas media stage. `decoder` selects the
    * codec ([[imageDecode]] for real images, [[fakeDecode]] — the
    * default — for non-media fixtures); the plumbing is decoder-
    * independent. */
  def decodeBatch(media: DataFrame, idCol: String = "doc_id",
                  binCol: String = "media",
                  decoder: (Long, Array[Byte]) => DecodedMedia = fakeDecode): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (real codec handle)
        rows.map { r =>
          val d = decoder(r.getLong(0), r.getAs[Array[Byte]](1))
          org.apache.spark.sql.Row(d.docId, d.width, d.height, d.nFrames, d.meanLuma)
        }
      }(enc)
  }

  /** Documents rendered as a binary media column — the shape a real
    * media table would have (id, bytes, metadata columns). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        col("source"), col("n_chars"))

  /** mm05: per-source audio-corpus stats over the audio modality
    * slice (doc_id % 3 = 1 — mm02's deterministic assignment), with
    * the fixture's utf-8 bytes standing in as unsigned 8-bit mono
    * samples at 8 kHz (the [[fakeAudioDecode]] rule, applied
    * relationally so the WHOLE aggregate is oracle-checkable): clip
    * count, total samples/seconds, mean and RMS amplitude — the
    * capacity/level report an audio dataset build starts with.
    * Real WAV bytes go through [[wavDecode]] + [[decodeAudioBatch]];
    * this query is the columnar twin over the documents fixture.
    *
    * Oracle parity: per-byte sums are exact BIGINTs (ASCII fixture:
    * Spark's `split(text, '')`+`ascii` ≡ DuckDB's `string_split`+
    * `ord`, verified element-wise); mean/RMS divide the SAME two
    * integers in both engines, so the doubles are bit-identical.
    * Plan shape: one per-row codegen'd array fold, one map-side-
    * combinable groupBy — linear, shuffle only on `source`. */
  def mm05AudioStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("source"),
        octet_length(col("text")).cast("long").as("n_samples"),
        aggregate(split(col("text"), ""), lit(0L),
          (a, c) => a + ascii(c)).as("amp_sum"),
        aggregate(split(col("text"), ""), lit(0L),
          (a, c) => a + ascii(c) * ascii(c)).as("sq_sum"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_clips"),
        sum("n_samples").as("total_samples"),
        sum("amp_sum").as("sum_amp"),
        sum("sq_sum").as("sum_sq"))
      .select(col("source"), col("n_clips"), col("total_samples"),
        (col("total_samples").cast("double") / 8000.0).as("total_seconds"),
        (col("sum_amp").cast("double") / col("total_samples")).as("mean_amp"),
        sqrt(col("sum_sq").cast("double") / col("total_samples")).as("rms_amp"))
      .orderBy("source")

  /** Decoded-audio record produced by the audio decoder seam. */
  case class DecodedAudio(docId: Long, sampleRate: Int, channels: Int,
                          nSamples: Long, rmsAmp: Double)

  /** Deterministic fake audio decode — the fast TEST DOUBLE for
    * non-media fixtures (documents-as-blobs): bytes as unsigned
    * 8-bit mono samples at 8 kHz, RMS over byte values — the same
    * rule [[mm05AudioStats]] applies relationally. */
  def fakeAudioDecode(id: Long, bytes: Array[Byte]): DecodedAudio = {
    var i = 0
    var sq = 0.0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sq += v.toDouble * v
      i += 1
    }
    DecodedAudio(id, 8000, 1, bytes.length,
      if (bytes.isEmpty) 0.0 else math.sqrt(sq / bytes.length))
  }

  /** REAL WAV decode on the pure JDK (`javax.sound.sampled` — the
    * WAVE reader ships in every JRE, no codec dependency): sample
    * rate and channel count from the format header, nSamples = PCM
    * frames, rmsAmp = RMS over the signed 16-bit samples of ALL
    * channels (the level statistic; the luma analog of
    * [[imageDecode]]). This fills the production slot of the
    * [[decodeAudioBatch]] seam; the fake stays as the double.
    * Undecodable or non-16-bit-PCM bytes fail loudly
    * ([[imageDecode]]'s rule — a silent zero row would poison
    * downstream stats). */
  def wavDecode(id: Long, bytes: Array[Byte]): DecodedAudio = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"undecodable audio bytes for id=$id (${bytes.length} bytes)", e)
      }
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"expected 16-bit signed PCM for id=$id, got $fmt")
      val data = in.readAllBytes()
      val be = fmt.isBigEndian
      val n = data.length / 2
      var i = 0
      var sq = 0.0
      while (i + 1 < data.length) {
        val s =
          if (be) (data(i) << 8) | (data(i + 1) & 0xff)
          else (data(i + 1) << 8) | (data(i) & 0xff)
        sq += s.toDouble * s
        i += 2
      }
      DecodedAudio(id, fmt.getSampleRate.toInt, fmt.getChannels,
        n / fmt.getChannels, if (n == 0) 0.0 else math.sqrt(sq / n))
    } finally in.close()
  }

  /** A decimated audio row: re-encoded WAV bytes plus the new
    * geometry — the audio analog of [[ResizedMedia]]. */
  case class ResampledAudio(id: Long, wav: Array[Byte], sampleRate: Int,
                            channels: Int, nSamples: Long)

  /** REAL WAV downsample on the pure JDK, fully DETERMINISTIC:
    * integer-FACTOR decimation — keep every `factor`-th PCM frame
    * (all channels of it), divide the declared sample rate by the
    * factor, re-encode as 16-bit little-endian WAV. The audio analog
    * of [[imageResize]]'s nearest-neighbor rule, and deliberately
    * not an interpolating resampler for the same reason: byte-stable
    * artifacts (a model-side transform owns filtering; constant or
    * frame-periodic signals decimate losslessly — spec-pinned).
    * Integer factors only: arbitrary-ratio resampling needs
    * interpolation by construction. Same loud-failure rule as
    * [[wavDecode]]. */
  def wavDecimate(id: Long, bytes: Array[Byte], factor: Int): ResampledAudio = {
    require(factor >= 1, s"bad decimation factor $factor for id=$id")
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"undecodable audio bytes for id=$id (${bytes.length} bytes)", e)
      }
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"expected 16-bit signed PCM for id=$id, got $fmt")
      require(fmt.getSampleRate.toInt % factor == 0,
        s"rate ${fmt.getSampleRate.toInt} not divisible by $factor for id=$id")
      val data = in.readAllBytes()
      val ch = fmt.getChannels
      val be = fmt.isBigEndian
      val frameBytes = 2 * ch
      val nFrames = data.length / frameBytes
      val outFrames = (nFrames + factor - 1) / factor
      val out = new Array[Byte](outFrames * frameBytes)
      var f = 0
      var o = 0
      while (f < nFrames) {
        var b = 0
        while (b < frameBytes) {
          // normalize to little-endian output regardless of input
          val src = f * frameBytes + (if (be) b ^ 1 else b)
          out(o) = data(src)
          b += 1
          o += 1
        }
        f += factor
      }
      val outFmt = new javax.sound.sampled.AudioFormat(
        fmt.getSampleRate / factor, 16, ch, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(out), outFmt, outFrames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      ResampledAudio(id, bos.toByteArray, fmt.getSampleRate.toInt / factor,
        ch, outFrames.toLong)
    } finally in.close()
  }

  /** Batch decimation over a binary audio column — the
    * [[decodeAudioBatch]] plumbing with the resample slot. */
  def decimateBatch(media: DataFrame, factor: Int,
                    idCol: String = "doc_id",
                    binCol: String = "media"): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => wavDecimate(id, bytes, factor) }
      }
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("rms_amp", DoubleType, nullable = false)))

  /** Partition-wise audio decode — [[decodeBatch]]'s plumbing for
    * the audio modality: (id, binary) → typed rows, bytes never
    * leave their partition, decoder selected per deployment
    * ([[wavDecode]] for real WAV, [[fakeAudioDecode]] — the default
    * — for non-media fixtures). */
  def decodeAudioBatch(media: DataFrame, idCol: String = "doc_id",
                       binCol: String = "media",
                       decoder: (Long, Array[Byte]) => DecodedAudio = fakeAudioDecode): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioSchema)
    media.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val d = decoder(r.getLong(0), r.getAs[Array[Byte]](1))
          org.apache.spark.sql.Row(d.docId, d.sampleRate, d.channels,
            d.nSamples, d.rmsAmp)
        }
      }(enc)
  }

  val oracles: Map[String, String] = Map(
    "mm08_silence_segments" ->
      """WITH f AS (SELECT doc_id, text,
        |    unnest(generate_series(1, CAST(ceil(n_chars / 32.0) AS BIGINT))) AS frame_no
        |  FROM documents WHERE doc_id % 3 = 1),
        |sc AS (SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |    CAST(length(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32)) AS BIGINT) AS window_len,
        |    CAST(list_aggregate(list_transform(string_split(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32), ''), c -> CAST(ord(c) AS BIGINT) * CAST(ord(c) AS BIGINT)), 'sum') AS BIGINT) AS sq_sum
        |  FROM f),
        |cl AS (SELECT doc_id, frame_no, sq_sum <= window_len * 1089 AS is_silence FROM sc),
        |fl AS (SELECT doc_id, frame_no, is_silence,
        |    CASE WHEN lag(is_silence) OVER (PARTITION BY doc_id ORDER BY frame_no)
        |              IS DISTINCT FROM is_silence THEN 1 ELSE 0 END AS boundary
        |  FROM cl),
        |sn AS (SELECT doc_id, is_silence,
        |    CAST(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY frame_no
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg_no
        |  FROM fl),
        |sg AS (SELECT doc_id, seg_no, is_silence, COUNT(*) AS seg_len
        |       FROM sn GROUP BY doc_id, seg_no, is_silence)
        |SELECT doc_id,
        |  CAST(SUM(seg_len) AS BIGINT) AS n_windows,
        |  CAST(SUM(CASE WHEN is_silence THEN seg_len ELSE 0 END) AS BIGINT) AS n_silence_windows,
        |  COUNT(*) AS n_segments,
        |  CAST(SUM(CASE WHEN is_silence THEN 1 ELSE 0 END) AS BIGINT) AS n_silence_segments,
        |  CAST(MAX(CASE WHEN is_silence THEN seg_len ELSE 0 END) AS BIGINT) AS longest_silence,
        |  CAST(SUM(seg_len) - SUM(CASE WHEN is_silence THEN seg_len ELSE 0 END) AS DOUBLE)
        |    / SUM(seg_len) AS speech_ratio
        |FROM sg GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "mm07_scene_sample" ->
      """WITH f AS (SELECT doc_id, text,
        |    unnest(generate_series(1, CAST(ceil(n_chars / 32.0) AS BIGINT))) AS frame_no
        |  FROM documents),
        |fr AS (SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |    CAST((frame_no - 1) * 32 AS BIGINT) AS byte_off,
        |    md5(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32)) AS frame_md5
        |  FROM f),
        |fl AS (SELECT doc_id, frame_no, byte_off, frame_md5,
        |    CASE WHEN lag(frame_md5) OVER (PARTITION BY doc_id ORDER BY frame_no)
        |              IS DISTINCT FROM frame_md5 THEN 1 ELSE 0 END AS boundary
        |  FROM fr),
        |sn AS (SELECT doc_id, frame_no, byte_off, frame_md5, boundary,
        |    CAST(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY frame_no
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_no
        |  FROM fl),
        |sl AS (SELECT *, COUNT(*) OVER (PARTITION BY doc_id, scene_no) AS scene_len
        |       FROM sn)
        |SELECT doc_id, scene_no, frame_no, byte_off, frame_md5,
        |  CAST(scene_len AS BIGINT) AS scene_len,
        |  CAST(scene_len - 1 AS BIGINT) AS saved_frames
        |FROM sl WHERE boundary = 1 ORDER BY doc_id, scene_no""".stripMargin,

    "mm06_scene_index" ->
      """WITH f AS (SELECT doc_id, text,
        |    unnest(generate_series(1, CAST(ceil(n_chars / 32.0) AS BIGINT))) AS frame_no
        |  FROM documents),
        |fr AS (SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |    md5(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32)) AS frame_md5
        |  FROM f),
        |fl AS (SELECT doc_id, frame_no, frame_md5,
        |    CASE WHEN lag(frame_md5) OVER (PARTITION BY doc_id ORDER BY frame_no)
        |              IS DISTINCT FROM frame_md5 THEN 1 ELSE 0 END AS boundary
        |  FROM fr),
        |sn AS (SELECT doc_id, frame_no,
        |    SUM(boundary) OVER (PARTITION BY doc_id ORDER BY frame_no
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_no
        |  FROM fl),
        |sc AS (SELECT doc_id, scene_no, COUNT(*) AS scene_len
        |       FROM sn GROUP BY doc_id, scene_no)
        |SELECT doc_id,
        |  CAST(SUM(scene_len) AS BIGINT) AS n_frames,
        |  COUNT(*) AS n_scenes,
        |  CAST(SUM(scene_len) - COUNT(*) AS BIGINT) AS n_static,
        |  CAST(MAX(scene_len) AS BIGINT) AS longest_scene
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "mm05_audio_stats" ->
      """WITH a AS (SELECT source,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_samples,
        |    CAST(list_aggregate(list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT)), 'sum') AS BIGINT) AS amp_sum,
        |    CAST(list_aggregate(list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT) * CAST(ord(c) AS BIGINT)), 'sum') AS BIGINT) AS sq_sum
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT source, COUNT(*) AS n_clips,
        |  CAST(SUM(n_samples) AS BIGINT) AS total_samples,
        |  CAST(SUM(n_samples) AS DOUBLE) / 8000.0 AS total_seconds,
        |  CAST(SUM(amp_sum) AS DOUBLE) / SUM(n_samples) AS mean_amp,
        |  sqrt(CAST(SUM(sq_sum) AS DOUBLE) / SUM(n_samples)) AS rms_amp
        |FROM a GROUP BY source ORDER BY source""".stripMargin,

    "mm03_frame_index" ->
      """WITH f AS (SELECT doc_id, text,
        |    unnest(generate_series(1, CAST(ceil(n_chars / 32.0) AS BIGINT))) AS frame_no
        |  FROM documents)
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST((frame_no - 1) * 32 AS BIGINT) AS byte_off,
        |  md5(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32)) AS frame_md5,
        |  CAST(length(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32)) AS BIGINT) AS frame_len
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,

    "mm04_frame_dedup" ->
      """WITH f AS (SELECT doc_id, text,
        |    unnest(generate_series(1, CAST(ceil(n_chars / 32.0) AS BIGINT))) AS frame_no
        |  FROM documents),
        |fr AS (SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |    md5(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32)) AS frame_md5,
        |    CAST(length(substr(text, CAST((frame_no - 1) * 32 + 1 AS INT), 32)) AS BIGINT) AS frame_len
        |  FROM f),
        |g AS (SELECT frame_md5, COUNT(*) AS n_occurrences,
        |    COUNT(DISTINCT doc_id) AS n_docs, MAX(frame_len) AS frame_len
        |  FROM fr GROUP BY 1),
        |k AS (SELECT frame_md5, doc_id AS keep_doc_id, frame_no AS keep_frame_no FROM (
        |    SELECT frame_md5, doc_id, frame_no,
        |      row_number() OVER (PARTITION BY frame_md5 ORDER BY doc_id, frame_no) AS rn
        |    FROM fr) t WHERE rn = 1)
        |SELECT g.frame_md5, g.n_occurrences, g.n_docs, k.keep_doc_id, k.keep_frame_no,
        |  (g.n_occurrences - 1) * g.frame_len AS reclaimable_bytes
        |FROM g JOIN k USING (frame_md5)
        |WHERE g.n_occurrences >= 2 ORDER BY frame_md5""".stripMargin,

    "mm02_modality_stats" ->
      """SELECT source,
        |  (CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END) AS modality,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  CAST(SUM(CAST(ceil(n_chars / 32.0) AS BIGINT)) AS BIGINT) AS total_frames,
        |  COUNT(DISTINCT md5(text)) AS n_distinct
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "mm11_incremental_match" ->
      """WITH src AS (SELECT doc_id, text FROM documents WHERE len(text) >= 8),
        |allc AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, '~~~~' || substr(text, 5) AS text
        |  FROM src WHERE doc_id % 10 >= 8),
        |ch AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS code, len(text) AS n
        |  FROM allc, LATERAL unnest(generate_series(1, len(text))) AS t(i)),
        |blk AS (SELECT doc_id, (pos * 64) // n AS b,
        |          CAST(SUM(code) AS BIGINT) AS s, COUNT(*) AS nb
        |        FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS st,
        |          CAST(SUM(nb) AS BIGINT) AS nt FROM blk GROUP BY 1),
        |bits AS (SELECT blk.doc_id, b,
        |           CASE WHEN CAST(s AS HUGEINT) * nt > CAST(st AS HUGEINT) * nb
        |             THEN 1 ELSE 0 END AS bit
        |         FROM blk JOIN tot ON tot.doc_id = blk.doc_id),
        |h AS (SELECT doc_id,
        |        CAST(SUM(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS h_hi,
        |        CAST(SUM(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS h_lo
        |      FROM bits GROUP BY 1),
        |arr AS (SELECT * FROM h WHERE doc_id >= 1000000),
        |corp AS (SELECT * FROM h WHERE doc_id < 1000000),
        |ab AS (SELECT doc_id, band, bandval FROM arr, LATERAL (VALUES
        |         (0, h_hi >> 16), (1, h_hi & 65535),
        |         (2, h_lo >> 16), (3, h_lo & 65535)) AS b(band, bandval)),
        |cb AS (SELECT doc_id, band, bandval FROM corp, LATERAL (VALUES
        |         (0, h_hi >> 16), (1, h_hi & 65535),
        |         (2, h_lo >> 16), (3, h_lo & 65535)) AS b(band, bandval)),
        |cand AS (SELECT DISTINCT ab.doc_id AS doc_id, cb.doc_id AS match_id
        |         FROM ab JOIN cb USING (band, bandval)),
        |v AS (SELECT c.doc_id, c.match_id,
        |        CAST(bit_count(xor(a.h_hi, k.h_hi)) +
        |             bit_count(xor(a.h_lo, k.h_lo)) AS BIGINT) AS hamming
        |      FROM cand c
        |      JOIN arr a ON a.doc_id = c.doc_id
        |      JOIN corp k ON k.doc_id = c.match_id)
        |SELECT doc_id, match_id, hamming FROM v
        |WHERE hamming <= 3 ORDER BY doc_id, match_id""".stripMargin,

    "mm12_band_drift" ->
      """WITH src AS (SELECT doc_id, text FROM documents WHERE len(text) >= 8),
        |allc AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, '~~~~' || substr(text, 5) AS text
        |  FROM src WHERE doc_id % 10 >= 8),
        |ch AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS code, len(text) AS n
        |  FROM allc, LATERAL unnest(generate_series(1, len(text))) AS t(i)),
        |blk AS (SELECT doc_id, (pos * 64) // n AS b,
        |          CAST(SUM(code) AS BIGINT) AS s, COUNT(*) AS nb
        |        FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS st,
        |          CAST(SUM(nb) AS BIGINT) AS nt FROM blk GROUP BY 1),
        |bits AS (SELECT blk.doc_id, b,
        |           CASE WHEN CAST(s AS HUGEINT) * nt > CAST(st AS HUGEINT) * nb
        |             THEN 1 ELSE 0 END AS bit
        |         FROM blk JOIN tot ON tot.doc_id = blk.doc_id),
        |h AS (SELECT doc_id,
        |        CAST(SUM(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS h_hi,
        |        CAST(SUM(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS h_lo
        |      FROM bits GROUP BY 1),
        |ab AS (SELECT doc_id, band, bandval FROM h, LATERAL (VALUES
        |         (0, h_hi >> 16), (1, h_hi & 65535),
        |         (2, h_lo >> 16), (3, h_lo & 65535)) AS b(band, bandval)
        |       WHERE doc_id >= 1000000),
        |cb AS (SELECT doc_id, band, bandval FROM h, LATERAL (VALUES
        |         (0, h_hi >> 16), (1, h_hi & 65535),
        |         (2, h_lo >> 16), (3, h_lo & 65535)) AS b(band, bandval)
        |       WHERE doc_id < 1000000),
        |cbo AS (SELECT band, bandval, COUNT(*) AS occ FROM cb GROUP BY 1, 2),
        |abo AS (SELECT band, bandval, COUNT(*) AS n FROM ab GROUP BY 1, 2),
        |cagg AS (SELECT band, COUNT(*) AS n_corp_buckets,
        |           CAST(MAX(occ) AS BIGINT) AS max_corp_occ
        |         FROM cbo GROUP BY 1),
        |aagg AS (SELECT a.band, COUNT(*) AS n_arr_buckets,
        |           CAST(SUM(CASE WHEN c.bandval IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new_buckets,
        |           CAST(SUM(a.n) AS BIGINT) AS n_arr_rows,
        |           CAST(SUM(CASE WHEN c.bandval IS NOT NULL THEN a.n ELSE 0 END) AS BIGINT) AS n_arr_hit
        |         FROM abo a LEFT JOIN cbo c
        |           ON a.band = c.band AND a.bandval = c.bandval
        |         GROUP BY 1)
        |SELECT CAST(band AS BIGINT) AS band, n_corp_buckets, max_corp_occ,
        |  n_arr_buckets, n_new_buckets, n_arr_rows, n_arr_hit,
        |  CAST(n_arr_hit AS DOUBLE) / n_arr_rows AS hit_share
        |FROM cagg JOIN aagg USING (band) ORDER BY band""".stripMargin,

    "mm09_phash" ->
      """WITH ch AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS code, len(text) AS n
        |  FROM documents, LATERAL unnest(generate_series(1, len(text))) AS t(i)
        |  WHERE len(text) >= 1),
        |blk AS (SELECT doc_id, (pos * 64) // n AS b,
        |          CAST(SUM(code) AS BIGINT) AS s, COUNT(*) AS nb
        |        FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS st,
        |          CAST(SUM(nb) AS BIGINT) AS nt FROM blk GROUP BY 1),
        |bits AS (SELECT blk.doc_id, b,
        |           CASE WHEN CAST(s AS HUGEINT) * nt > CAST(st AS HUGEINT) * nb
        |             THEN 1 ELSE 0 END AS bit
        |         FROM blk JOIN tot ON tot.doc_id = blk.doc_id),
        |h AS (SELECT doc_id,
        |        CAST(SUM(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS h_hi,
        |        CAST(SUM(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS h_lo
        |      FROM bits GROUP BY 1)
        |SELECT doc_id, h_hi, h_lo,
        |  CAST(bit_count(h_hi) + bit_count(h_lo) AS BIGINT) AS n_bits_set
        |FROM h ORDER BY doc_id""".stripMargin,

    "mm01_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(ceil(n_chars / 32.0) AS BIGINT) AS n_frames,
        |  array_to_string(list_transform(generate_series(1, CAST(ceil(n_chars / 32.0) AS BIGINT)), i -> substr(text, CAST((i - 1) * 32 + 1 AS INT), 1)), '') AS frame_sample
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
