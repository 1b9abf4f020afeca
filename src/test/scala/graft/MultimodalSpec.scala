package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decodeBatch produces typed features per media row") {
    val media = Multimodal.mediaTable(spark, sf)
    val decoded = Multimodal.decodeBatch(media)
    assert(decoded.schema.fieldNames.toSeq ===
      Seq("doc_id", "width", "height", "n_frames", "mean_luma"))
    val n = media.count()
    assert(decoded.count() === n)
    // deterministic: same input -> same features
    val a = decoded.orderBy("doc_id").collect()
    val b = Multimodal.decodeBatch(media).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // features are derived from real byte content
    val row = decoded.orderBy("doc_id").first()
    assert(row.getInt(1) >= 16 && row.getInt(2) >= 16)
    assert(row.getDouble(4) > 0.0)
  }

  test("imageDecode decodes real PNG bytes through the decodeBatch seam") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // deterministic synthetic PNGs: id i is (8+i)×(6+2i), filled with
    // a solid color derived from i, plus one off-color pixel at (0,0)
    // so the luma mean is NOT the fill's luma (catches a decoder that
    // reads only one pixel or inverts channels)
    def png(i: Int): (Long, Array[Byte], Int, Int, Double) = {
      val w = 8 + i
      val h = 6 + 2 * i
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val (r, g, b) = (40 * i % 256, 90 + 30 * i, 17 * i % 256)
      val fill = (r << 16) | (g << 8) | b
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill)
      img.setRGB(0, 0, (255 << 16) | (255 << 8) | 255)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      val lumaFill = 0.299 * r + 0.587 * g + 0.114 * b
      val luma = (lumaFill * (w * h - 1) + 255.0) / (w * h)
      (i.toLong, bos.toByteArray, w, h, luma)
    }
    val fixtures = (0 until 5).map(png)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtures.map(f =>
        org.apache.spark.sql.Row(f._1, f._2)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("media",
          org.apache.spark.sql.types.BinaryType, nullable = false))))
    val decoded = Multimodal.decodeBatch(media, decoder = Multimodal.imageDecode)
      .orderBy("doc_id").collect()
    assert(decoded.length === fixtures.length)
    fixtures.zip(decoded).foreach { case ((id, _, w, h, luma), row) =>
      assert(row.getLong(0) === id)
      assert(row.getInt(1) === w, s"width of id=$id")
      assert(row.getInt(2) === h, s"height of id=$id")
      assert(row.getInt(3) === 1)
      assert(math.abs(row.getDouble(4) - luma) < 1e-9,
        s"mean luma of id=$id: got ${row.getDouble(4)}, want $luma")
    }
    // garbage bytes fail loudly, not silently
    intercept[Exception] {
      Multimodal.imageDecode(99L, Array[Byte](1, 2, 3))
    }
  }

  test("wavDecode decodes real WAV bytes through the decodeAudioBatch seam") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    // deterministic synthetic WAVs: id i is 16-bit PCM, sample rate
    // 8000·(i+1), channels 1+(i%2), frames 200+50·i, sample value
    // s(j) = (j·37 + i·101) % 2001 − 1000 — an exact integer ramp so
    // the expected RMS is computed from the SAME doubles the decoder
    // accumulates (no tolerance needed beyond float ulp)
    def wav(i: Int): (Long, Array[Byte], Int, Int, Long, Double) = {
      val rate = 8000 * (i + 1)
      val ch = 1 + (i % 2)
      val frames = 200 + 50 * i
      val n = frames * ch
      val samples = Array.tabulate(n)(j => ((j * 37 + i * 101) % 2001 - 1000).toShort)
      val pcm = new Array[Byte](n * 2) // little-endian 16-bit
      samples.zipWithIndex.foreach { case (s, j) =>
        pcm(2 * j) = (s & 0xff).toByte
        pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      var sq = 0.0
      samples.foreach(s => sq += s.toDouble * s)
      (i.toLong, bos.toByteArray, rate, ch, frames.toLong, math.sqrt(sq / n))
    }
    val fixtures = (0 until 4).map(wav)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtures.map(f =>
        org.apache.spark.sql.Row(f._1, f._2)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("media",
          org.apache.spark.sql.types.BinaryType, nullable = false))))
    val decoded = Multimodal.decodeAudioBatch(media, decoder = Multimodal.wavDecode)
      .orderBy("doc_id").collect()
    assert(decoded.length === fixtures.length)
    fixtures.zip(decoded).foreach { case ((id, _, rate, ch, frames, rms), row) =>
      assert(row.getLong(0) === id)
      assert(row.getInt(1) === rate, s"sample rate of id=$id")
      assert(row.getInt(2) === ch, s"channels of id=$id")
      assert(row.getLong(3) === frames, s"frames of id=$id")
      assert(math.abs(row.getDouble(4) - rms) < 1e-9,
        s"rms of id=$id: got ${row.getDouble(4)}, want $rms")
    }
    // garbage bytes fail loudly, not silently
    intercept[Exception] {
      Multimodal.wavDecode(99L, Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("wavDecimate keeps every factor-th frame exactly, halves the rate, and batches") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    // stereo fixture with a per-frame integer ramp so the expected
    // decimated samples are the originals at even frame indices
    val ch = 2
    val frames = 301 // odd: exercises the ceil on the output count
    val samples = Array.tabulate(frames * ch)(j => ((j * 53) % 1801 - 900).toShort)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, j) =>
      pcm(2 * j) = (s & 0xff).toByte
      pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm),
        new AudioFormat(16000f, 16, ch, true, false), frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val src = bos.toByteArray

    val d = Multimodal.wavDecimate(7L, src, 2)
    assert(d.sampleRate === 8000 && d.channels === ch && d.nSamples === 151)
    // decode the decimated WAV and compare sample-for-sample against
    // the even source frames (both channels of each kept frame)
    val back = AudioSystem.getAudioInputStream(new ByteArrayInputStream(d.wav))
    val data = back.readAllBytes(); back.close()
    assert(data.length === 151 * ch * 2)
    for (f <- 0 until 151; c <- 0 until ch) {
      val got = ((data(2 * (f * ch + c) + 1) << 8) |
        (data(2 * (f * ch + c)) & 0xff)).toShort
      assert(got === samples(2 * f * ch + c), s"frame $f channel $c")
    }
    // determinism + factor-1 identity of the payload
    assert(Multimodal.wavDecimate(7L, src, 2).wav.toSeq === d.wav.toSeq)
    assert(Multimodal.wavDecimate(7L, src, 1).nSamples === frames.toLong)
    // indivisible rate fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.wavDecimate(7L, src, 3) // 16000 % 3 != 0
    }
    // the batch seam
    import spark.implicits._
    val media = Seq((1L, src), (2L, src)).toDF("doc_id", "media")
    val batch = Multimodal.decimateBatch(media, 2).collect().sortBy(_.id)
    assert(batch.map(_.id).toSeq === Seq(1L, 2L) &&
      batch.forall(r => r.sampleRate === 8000 && r.nSamples === 151))
  }

  test("fakeAudioDecode matches mm05's relational per-byte rule") {
    // the fake IS mm05's sample model (unsigned bytes, 8 kHz mono):
    // cross-check one document's RMS against the relational pipeline
    val doc = graft.sources.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 1)
      .orderBy("doc_id").select("doc_id", "text").first()
    val d = Multimodal.fakeAudioDecode(doc.getLong(0), doc.getString(1).getBytes("UTF-8"))
    assert(d.sampleRate === 8000 && d.channels === 1)
    assert(d.nSamples === doc.getString(1).getBytes("UTF-8").length.toLong)
    var sq = 0.0
    doc.getString(1).getBytes("UTF-8").foreach(b => sq += (b & 0xff).toDouble * (b & 0xff))
    assert(math.abs(d.rmsAmp - math.sqrt(sq / d.nSamples)) < 1e-12)
  }

  test("fakeDecode is stable and total") {
    val d1 = Multimodal.fakeDecode(7L, "hello world".getBytes)
    val d2 = Multimodal.fakeDecode(7L, "hello world".getBytes)
    assert(d1 === d2)
    val empty = Multimodal.fakeDecode(1L, Array.emptyByteArray)
    assert(empty.meanLuma === 0.0)
  }

  test("imageAHash + phashPairs: perturbed copies pair, distinct images don't") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // three structurally different 64×64 bases (high-contrast block
    // patterns so no cell mean sits near the global mean), each with
    // a near-identical copy: a few pixels nudged by a small delta —
    // at most a hash bit or two can move
    def base(seed: Int): BufferedImage = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val cell = (y / 8) * 8 + (x / 8)
        // per-base deterministic on/off cell pattern
        val on = ((cell * (seed * 2 + 3) + seed) % 7) < 3
        val v = if (on) 230 else 20
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def perturb(img: BufferedImage): BufferedImage = {
      val c = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) c.setRGB(x, y, img.getRGB(x, y))
      // nudge 3 pixels by ±6 luma — cell means move < 0.1
      Seq((3, 5), (40, 22), (61, 60)).foreach { case (x, y) =>
        val v = (c.getRGB(x, y) & 0xff) + 6
        c.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      c
    }
    def bytes(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val hashes = (0 until 3).flatMap { s =>
      val b = base(s)
      Seq(Multimodal.imageAHash(s.toLong, bytes(b)),
        Multimodal.imageAHash(s.toLong + 100, bytes(perturb(b))))
    }
    def hamming(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
    // true pairs are close, cross-base pairs are far
    val byId = hashes.map(h => h._1 -> h).toMap
    (0 until 3).foreach { s =>
      assert(hamming(byId(s.toLong), byId(s.toLong + 100)) <= 3)
    }
    for (s <- 0 until 3; t <- 0 until 3 if s < t)
      assert(hamming(byId(s.toLong), byId(t.toLong)) > 3)
    // the banded pair join finds exactly the three true pairs
    val hdf = spark.createDataFrame(hashes.map(h => (h._1, h._2, h._3)))
      .toDF("doc_id", "h_hi", "h_lo")
    val pairs = Multimodal.phashPairs(hdf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 3).map(s => (s.toLong, s.toLong + 100)).toSet)
  }

  test("mediaPipeline e2e: resize→aHash→pairs equals the hand-composed stages") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // reuse the aHash fixture class: three distinct bases, each with
    // a perturbed near-copy — rendered at a LARGER geometry (96×96)
    // so the pipeline's resize stage actually does work
    def base(seed: Int): BufferedImage = {
      val img = new BufferedImage(96, 96, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 96; x <- 0 until 96) {
        val cell = (y / 12) * 8 + (x / 12)
        val on = ((cell * (seed * 2 + 3) + seed) % 7) < 3
        val v = if (on) 230 else 20
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def perturb(img: BufferedImage): BufferedImage = {
      val c = new BufferedImage(96, 96, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 96; x <- 0 until 96) c.setRGB(x, y, img.getRGB(x, y))
      Seq((3, 5), (60, 33), (91, 90)).foreach { case (x, y) =>
        val v = (c.getRGB(x, y) & 0xff) + 6
        c.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      c
    }
    def bytes(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataFrame((0 until 3).flatMap { s =>
      val b = base(s)
      Seq((s.toLong, bytes(b)), (s.toLong + 100, bytes(perturb(b))))
    }).toDF("doc_id", "media")

    val pipe = Multimodal.mediaPipeline(media, tw = 32, th = 32)
    // the composed operator == its stages run by hand
    import spark.implicits._
    val hand = Multimodal.phashPairs(
      Multimodal.resizeBatch(media, 32, 32)
        .mapPartitions(rs => rs.map(r => Multimodal.imageAHash(r.id, r.png)))
        .toDF("doc_id", "h_hi", "h_lo"))
    assert(pipe.collect().toSeq == hand.collect().toSeq,
      "mediaPipeline must equal its hand-composed stages")
    // and the pairs are exactly the three perturbed-copy families
    val pairs = pipe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 3).map(s => (s.toLong, s.toLong + 100)).toSet,
      s"pipeline pairs wrong: $pairs")

    // the rendered bench corpus drives the same pipeline: families
    // (doc_id div 8) must produce pairs, and every pair stays within
    // one family (cross-family hashes are far by construction)
    val corpus = Multimodal.syntheticPngCorpus(spark, sf).limit(64)
    val cPairs = Multimodal.mediaPipeline(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cPairs.nonEmpty, "the bench corpus must produce near-dup pairs")
    assert(cPairs.forall { case (a, b) => a / 8 == b / 8 },
      "no cross-family pair may survive the hamming verify")
  }

  test("imageResize: deterministic nearest-neighbor, lossless on block-constant images") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // a 64×64 image constant on 8×8 cells (the aHash fixture class)
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = if (((y / 8) * 8 + (x / 8)) % 3 == 0) 220 else 35
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream(); ImageIO.write(img, "png", bos)
    val src = bos.toByteArray

    // DOWN 64→16: every sampled pixel hits its cell exactly
    val down = Multimodal.imageResize(1L, src, 16, 16)
    assert(down.width === 16 && down.height === 16)
    val dImg = ImageIO.read(new java.io.ByteArrayInputStream(down.png))
    for (y <- 0 until 16; x <- 0 until 16)
      assert(dImg.getRGB(x, y) === img.getRGB(x * 4, y * 4))

    // UP 16→64: x div 8 == (4·(x div 4)) div 8, so the round trip
    // reconstructs the block-constant original pixel-for-pixel
    val up = Multimodal.imageResize(1L, down.png, 64, 64)
    val uImg = ImageIO.read(new java.io.ByteArrayInputStream(up.png))
    for (y <- 0 until 64; x <- 0 until 64)
      assert(uImg.getRGB(x, y) === img.getRGB(x, y), s"pixel ($x,$y)")

    // determinism: identical bytes out on a second call
    assert(Multimodal.imageResize(1L, src, 16, 16).png.toSeq === down.png.toSeq)

    // the batch seam: bytes stay typed through mapPartitions and the
    // resized rows decode to the requested geometry
    import spark.implicits._
    val media = Seq((1L, src), (2L, src)).toDF("doc_id", "media")
    val batch = Multimodal.resizeBatch(media, 8, 8).collect().sortBy(_.id)
    assert(batch.map(_.id).toSeq === Seq(1L, 2L))
    batch.foreach { r =>
      val m = ImageIO.read(new java.io.ByteArrayInputStream(r.png))
      assert(m.getWidth === 8 && m.getHeight === 8)
    }

    // loud failure on junk, like the decode slot
    intercept[IllegalArgumentException] {
      Multimodal.imageResize(9L, "not a png".getBytes, 4, 4)
    }
  }

  test("phashPairs hot-band cap bounds degenerate buckets (and misses only capped pairs)") {
    // ADVICE r8: blank/uniform media all aHash to the same value, so
    // one band bucket collects the whole flood and the self-join goes
    // quadratic in it. 20 identical blank hashes (all four band
    // values 0) + one genuine near pair with distinct band values.
    val flood = (1000L until 1020L).map(id => (id, 0L, 0L))
    val truePair = Seq((1L, 0x12345678L, 0x9abcdef0L),
                       (2L, 0x12345678L, 0x9abcdef1L)) // hamming 1
    val hdf = spark.createDataFrame(flood ++ truePair)
      .toDF("doc_id", "h_hi", "h_lo")
    // uncapped: pigeonhole-exact — every flood pair (20·19/2) + the true pair
    val exact = Multimodal.phashPairs(hdf).collect()
    assert(exact.length === 190 + 1)
    // capped at 5 docs/bucket: the flood buckets (occupancy 20) are
    // dropped BEFORE the self-join; the true pair's buckets
    // (occupancy 2) survive. The 190 missed flood pairs are the
    // documented trade — exact dedup (mm04/d01) owns identical media.
    val capped = Multimodal.phashPairs(hdf, maxBandOccupancy = 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)))
  }

  test("mm09 byte-stream phash: bits reproduce a local reference") {
    val rows = graft.operators.Multimodal.mm09Phash(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val (id, hi, lo, nset) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val t = texts(id)
      // the local reference iterates UTF-16 code units; the operator
      // works in codepoints — identical only on ASCII, so pin the
      // fixture assumption rather than silently diverge on it
      assert(t.forall(_ < 128), s"doc $id is not ASCII; reference invalid")
      val n = t.length.toLong
      val s = new Array[Long](64)
      val c = new Array[Long](64)
      t.zipWithIndex.foreach { case (ch, pos) =>
        val b = ((pos * 64) / n).toInt
        s(b) += ch.toLong
        c(b) += 1
      }
      val (st, nt) = (s.sum, c.sum)
      var ehi = 0L
      var elo = 0L
      (0 until 64).foreach { b =>
        if (s(b) * nt > st * c(b)) {
          if (b >= 32) ehi |= 1L << (b - 32) else elo |= 1L << b
        }
      }
      assert(hi === ehi, s"h_hi of doc $id")
      assert(lo === elo, s"h_lo of doc $id")
      assert(nset === java.lang.Long.bitCount(ehi) + java.lang.Long.bitCount(elo))
    }
  }
}
