package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def sampleMedia = Seq(
    Media(1, "image", "fake-png-bytes-abcdefgh".getBytes, MediaMeta(Some(64), Some(48), None)),
    Media(2, "audio", "fake-wav-bytes-0123".getBytes, MediaMeta(None, None, Some(16000))),
    Media(3, "video", ("frame0" * 10).getBytes, MediaMeta(Some(320), Some(240), None)),
    Media(4, "image", Array.emptyByteArray, MediaMeta(Some(1), Some(1), None))).toDS()

  test("extractFeatures: deterministic stub features, fixed dim, partition-safe") {
    val out = extractFeatures(sampleMedia.repartition(3), dim = 8).collect()
    assert(out.length == 4)
    assert(out.forall(_.features.length == 8))
    val again = extractFeatures(sampleMedia, dim = 8).collect()
    assert(out.sortBy(_.id).zip(again.sortBy(_.id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
    assert(out.find(_.id == 4).get.n_bytes == 0) // empty payload survives
  }

  test("sampleFrames: only video rows, n in-order byte slices") {
    val frames = sampleFrames(sampleMedia, n = 4).collect()
    assert(frames.forall(_.getLong(0) == 3))
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
    val total = frames.map(_.getAs[Array[Byte]](2).length).sum
    assert(total > 0 && total <= "frame0".length * 10)
  }

  test("ingestFiles: binaryFile source rows become typed Media with kind + size filter") {
    val dir = tmpDir("media-ingest")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.png"), "pngbytes".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.wav"), "wavbytes!".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "c.mp4"), "m".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "huge.bin"),
      Array.fill[Byte](2048)(1))
    val media = Multimodal.ingestFiles(spark, dir, maxBytes = 1024).collect()
    assert(media.length == 3) // huge.bin filtered by length pushdown
    assert(media.map(_.kind).sorted.toSeq == Seq("audio", "image", "video"))
    assert(media.find(_.kind == "image").get.bytes.sameElements("pngbytes".getBytes))
    // features flow straight from ingest
    val feats = Multimodal.extractFeatures(
      Multimodal.ingestFiles(spark, dir, maxBytes = 1024)).collect()
    assert(feats.length == 3 && feats.forall(_.features.length == 8))
  }

  test("resizeImages: image payload becomes exactly w*h bytes, meta updated, others untouched") {
    val out = resizeImages(sampleMedia, targetW = 4, targetH = 3).collect()
    val img = out.find(_.id == 1).get
    assert(img.bytes.length == 12)
    assert(img.meta == MediaMeta(Some(4), Some(3), None))
    val audio = out.find(_.id == 2).get
    assert(audio.bytes.sameElements("fake-wav-bytes-0123".getBytes)) // pass-through
    // deterministic
    val again = resizeImages(sampleMedia, 4, 3).collect().find(_.id == 1).get
    assert(img.bytes.sameElements(again.bytes))
  }

  /** A real 8×6 PNG: left half black, right half white. */
  private def realPng(w: Int = 8, h: Int = 6): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decodes: probe fills true dimensions, features are pixel luminance") {
    val media = Seq(
      Media(10, "image", realPng(), MediaMeta(None, None, None)),
      Media(11, "image", "not-an-image".getBytes, MediaMeta(None, None, None))).toDS()
    val probed = probeMedia(media).collect()
    assert(probed.find(_.id == 10).get.meta == MediaMeta(Some(8), Some(6), None))
    assert(probed.find(_.id == 11).get.meta == MediaMeta(None, None, None)) // undecodable untouched
    val feats = extractFeatures(media, dim = 2).collect()
    val f10 = feats.find(_.id == 10).get.features
    assert(math.abs(f10(0)) < 1e-6f, "left half is black → ~0 luminance")
    assert(math.abs(f10(1) - 1.0f) < 1e-2f, "right half is white → ~1 luminance")
    // undecodable image falls back to the deterministic byte stub
    assert(feats.find(_.id == 11).get.features
      .sameElements(decodeStub("not-an-image".getBytes, 2)))
  }

  test("real PNG resize: output is a decodable PNG with the target dimensions") {
    val media = Seq(Media(10, "image", realPng(8, 6), MediaMeta(Some(8), Some(6), None))).toDS()
    val out = resizeImages(media, targetW = 4, targetH = 3).collect().head
    assert(out.meta == MediaMeta(Some(4), Some(3), None))
    val reread = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.bytes))
    assert(reread.getWidth == 4 && reread.getHeight == 3)
    // resampled content preserves the black→white split
    assert((reread.getRGB(0, 1) & 0xffffff) == 0x000000)
    assert((reread.getRGB(3, 1) & 0xffffff) == 0xffffff)
    // deterministic
    val again = resizeImages(media, 4, 3).collect().head
    assert(out.bytes.sameElements(again.bytes))
  }

  /** A real 16-bit mono 8 kHz WAV: 440 Hz sine for the first half,
    * silence for the second. */
  private def realWav(sampleRate: Int = 8000, nSamples: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples / 2) {
      val v = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 0.8 * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("24-bit PCM WAV decodes (studio export width), matching 16-bit RMS") {
    val sampleRate = 8000
    val n = 4000
    val pcm24 = new Array[Byte](n * 3)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 0.8 * 8388607).toInt
      pcm24(3 * i) = (v & 0xff).toByte
      pcm24(3 * i + 1) = ((v >> 8) & 0xff).toByte
      pcm24(3 * i + 2) = ((v >> 16) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 24, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm24), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val decoded = Multimodal.decodeAudio(bos.toByteArray)
    assert(decoded.isDefined, "24-bit PCM must decode, not fall back to the stub")
    val (sr, samples) = decoded.get
    assert(sr == sampleRate && samples.length == n)
    val rms = math.sqrt(samples.map(s => s * s).sum / n)
    assert(math.abs(rms - 0.8 / math.sqrt(2)) < 0.01, s"rms=$rms")
  }

  test("real WAV decodes: probe fills sample_rate, features are RMS energy per slice") {
    val media = Seq(
      Media(20, "audio", realWav(), MediaMeta(None, None, None)),
      Media(21, "audio", "not-audio".getBytes, MediaMeta(None, None, None))).toDS()
    val probed = probeMedia(media).collect()
    assert(probed.find(_.id == 20).get.meta == MediaMeta(None, None, Some(8000)))
    assert(probed.find(_.id == 21).get.meta == MediaMeta(None, None, None)) // undecodable untouched
    val feats = extractFeatures(media, dim = 2).collect()
    val f20 = feats.find(_.id == 20).get.features
    // first half: 0.8-amplitude sine → RMS ≈ 0.8/√2 ≈ 0.566; second half: silence
    assert(math.abs(f20(0) - 0.566f) < 0.02f, f20.mkString(","))
    assert(math.abs(f20(1)) < 1e-3f, f20.mkString(","))
    // undecodable audio falls back to the deterministic byte stub
    assert(feats.find(_.id == 21).get.features
      .sameElements(decodeStub("not-audio".getBytes, 2)))
  }

  /** A real PNG with a deterministic smooth gradient + seeded noise —
    * enough structure that distinct seeds give distant hashes. */
  private def noisyPng(seed: Int, w: Int = 64, h: Int = 48,
                       flipped: Int = 0): Array[Byte] = {
    val (fx, fy) = (1 + seed % 3, 1 + (seed / 3) % 3)
    val (px, py) = (seed * 37 % 100 / 100.0, seed * 53 % 100 / 100.0)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth (resize-stable) seeded structure: 2-D sinusoid over a ramp
      val s = math.sin(2 * math.Pi * (fx.toDouble * x / w + px)) *
        math.sin(2 * math.Pi * (fy.toDouble * y / h + py))
      val v = math.min(255, math.max(0, (128 + 80 * s + 20.0 * x / w).toInt))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val rnd2 = new scala.util.Random(seed + 1000)
    for (_ <- 0 until flipped) { // small local edits: a few corrupted pixels
      val (x, y) = (rnd2.nextInt(w), rnd2.nextInt(h))
      img.setRGB(x, y, 0xff0000)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageHashes: resize/re-encode-invariant-ish, edits move few bits, undecodable dropped") {
    val media = Seq(
      Media(1, "image", noisyPng(seed = 7), MediaMeta(None, None, None)),
      Media(2, "image", noisyPng(seed = 7, flipped = 6), MediaMeta(None, None, None)),
      Media(3, "image", noisyPng(seed = 99), MediaMeta(None, None, None)),
      Media(4, "image", "not-an-image".getBytes, MediaMeta(None, None, None)),
      Media(5, "audio", realWav(), MediaMeta(None, None, None))).toDS()
    val hashes = imageHashes(media).collect().map(ih => ih.id -> ih).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L)) // no pixels → no hash
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // a downscaled copy of the same image hashes within a small radius
    val resized = imageHashes(resizeImages(
      media.filter(_.id == 1L), targetW = 32, targetH = 24)).collect().head
    assert(ham(hashes(1L).dhash, resized.dhash) <= 3,
      s"resized copy drifted ${ham(hashes(1L).dhash, resized.dhash)} bits")
    // a few corrupted pixels move few bits; a different image is far away
    assert(ham(hashes(1L).dhash, hashes(2L).dhash) <= 3)
    assert(ham(hashes(1L).dhash, hashes(3L).dhash) > 10)
    assert(ham(hashes(1L).ahash, hashes(3L).ahash) > 10)
    // deterministic across partitionings
    val again = imageHashes(media.repartition(4)).collect().map(ih => ih.id -> ih).toMap
    assert(hashes == again)
  }

  test("nearDupImagePairs: banded join finds every pair within radius, none outside") {
    val media = Seq(
      Media(1, "image", noisyPng(seed = 7), MediaMeta(None, None, None)),
      Media(2, "image", noisyPng(seed = 7, flipped = 6), MediaMeta(None, None, None)),
      Media(3, "image", noisyPng(seed = 7, flipped = 9), MediaMeta(None, None, None)),
      Media(4, "image", noisyPng(seed = 99), MediaMeta(None, None, None)),
      Media(5, "image", noisyPng(seed = 123), MediaMeta(None, None, None))).toDS()
    val hashes = imageHashes(media).toDF().persist()
    val pairs = nearDupImagePairs(hashes, "dhash", maxHamming = 4)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // ground truth: brute-force over the collected hashes
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 4
    } yield (a, b, d)).toSet
    assert(got.toSet == want, s"got=$got want=$want") // recall 1 by pigeonhole
    assert(want.map { case (a, b, _) => (a, b) } == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // the plan is an equi-join: no cartesian / broadcast-nested-loop
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup join must stay an equi-join:\n$plan")
    // near-dup clusters resolve through the shared graph operator
    val comps = graft.operators.Graph.connectedComponents(
      pairs.select(col("id_a"), col("id_b"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(2L) == comps(3L) && comps(2L) == comps.getOrElse(1L, comps(2L)))
    hashes.unpersist()
  }

  /** WAV of 65 constant-amplitude 440 Hz segments (200 samples each) —
    * each fingerprint time slice maps to exactly one segment, so the
    * energy-gradient bits are the amplitude-difference signs. */
  private def segWav(amps: Seq[Double], gain: Double = 1.0): Array[Byte] = {
    val perSeg = 200
    val sampleRate = 8000
    val n = amps.length * perSeg
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 440 * i / sampleRate) *
        amps(i / perSeg) * gain * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioHashes: gain-invariant energy-gradient fingerprint; banded join finds audio near-dups") {
    val rnd = new scala.util.Random(11)
    val ampsA = Seq.fill(65)(0.1 + 0.8 * rnd.nextDouble())
    val ampsB = Seq.fill(65)(0.1 + 0.8 * rnd.nextDouble()) // unrelated clip
    // a lightly edited copy: swap two adjacent segment pairs — each swap
    // reverses that boundary's gradient sign, so ham >= 2 by construction
    val ampsA2 = ampsA
      .updated(10, ampsA(11)).updated(11, ampsA(10))
      .updated(40, ampsA(41)).updated(41, ampsA(40))
    val media = Seq(
      Media(1, "audio", segWav(ampsA), MediaMeta(None, None, Some(8000))),
      Media(2, "audio", segWav(ampsA, gain = 0.5), MediaMeta(None, None, Some(8000))),
      Media(3, "audio", segWav(ampsA2), MediaMeta(None, None, Some(8000))),
      Media(4, "audio", segWav(ampsB), MediaMeta(None, None, Some(8000))),
      Media(5, "audio", "not-audio".getBytes, MediaMeta(None, None, None)),
      Media(6, "image", "not-audio-either".getBytes, MediaMeta(None, None, None))).toDS()
    val fps = audioHashes(media).collect().map(h => h.id -> h.afp).toMap
    assert(fps.keySet == Set(1L, 2L, 3L, 4L)) // undecodable / non-audio dropped
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // uniform gain change: every slice RMS scales equally → same signs
    // (≤ 2 bits of 16-bit quantization slack on near-tied neighbors)
    assert(ham(fps(1L), fps(2L)) <= 2, s"gain copy drifted ${ham(fps(1L), fps(2L))} bits")
    // two swapped boundaries flip their gradient bits and at most the
    // four neighboring ones
    assert(ham(fps(1L), fps(3L)) <= 6 && ham(fps(1L), fps(3L)) >= 2)
    // an unrelated clip is far away
    assert(ham(fps(1L), fps(4L)) > 10)
    // deterministic across partitionings
    val again = audioHashes(media.repartition(4)).collect().map(h => h.id -> h.afp).toMap
    assert(fps == again)
    // the SAME Hamming-banded join serves audio: brute-force ground truth
    val pairs = nearDupImagePairs(audioHashes(media).toDF(), "afp", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- fps.keys; b <- fps.keys if a < b && ham(fps(a), fps(b)) <= 6
    } yield (a, b)).toSet
    assert(pairs == want, s"got=$pairs want=$want")
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L)) && !want.exists
      { case (a, b) => a == 4L || b == 4L })
  }

  test("property: Hamming banding has recall 1 at every radius 0..7, incl. negative hashes") {
    // synthetic 64-bit hashes, sign bit exercised (the top slice keeps the
    // remainder bits and sign-extends — both sides must agree)
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(30)(rnd.nextLong())
    // planted near pairs at controlled distances 1..10 bits from a base
    val perturbed = base.zipWithIndex.flatMap { case (h, i) =>
      val d = 1 + i % 10
      val flipped = (0 until d).foldLeft(h)((acc, k) => acc ^ (1L << ((i * 7 + k * 13) % 64)))
      Seq(flipped)
    }
    val all = (base ++ perturbed).distinct.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val hashes = all.toDF("id", "dhash")
    for (radius <- Seq(0, 2, 4, 7)) {
      val got = nearDupImagePairs(hashes, "dhash", maxHamming = radius)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, ha) <- all; (b, hb) <- all if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= radius
      } yield (a, b, d)).toSet
      assert(got == want, s"radius $radius: got ${got.size}, want ${want.size}")
    }
  }

  test("GFV1 container: encode→decode round-trip; foreign/truncated payloads → None") {
    val frames = Seq("aa".getBytes, Array.emptyByteArray, "frame-three".getBytes)
    val enc = encodeVideo(frames)
    val dec = decodeVideoFrames(enc)
    assert(dec.isDefined && dec.get.length == 3)
    assert(dec.get.zip(frames).forall { case (a, b) => a.sameElements(b) })
    assert(decodeVideoFrames(encodeVideo(Nil)).exists(_.isEmpty))
    assert(decodeVideoFrames("not-a-container".getBytes).isEmpty)
    assert(decodeVideoFrames(null).isEmpty)
    assert(decodeVideoFrames(enc.take(enc.length - 2)).isEmpty) // truncated body
  }

  test("sampleFrames: GFV1 containers yield real evenly-sampled frames; others keep the stub") {
    val fr = (0 until 6).map(i => s"frame-$i".getBytes)
    val media = Seq(
      Media(1, "video", encodeVideo(fr), MediaMeta(None, None, None)),
      Media(2, "video", ("raw" * 8).getBytes, MediaMeta(None, None, None))).toDS()
    // n = 3 of 6 → contained frames 0, 2, 4, re-indexed 0..2
    val real = sampleFrames(media.filter(_.id == 1L), n = 3).collect()
      .sortBy(_.getInt(1))
    assert(real.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(real.map(r => new String(r.getAs[Array[Byte]](2))).toSeq ==
      Seq("frame-0", "frame-2", "frame-4"))
    // n ≥ count → every contained frame exactly once
    val all = sampleFrames(media.filter(_.id == 1L), n = 99).collect()
    assert(all.length == 6 &&
      all.sortBy(_.getInt(1)).map(r => new String(r.getAs[Array[Byte]](2))).toSeq ==
        fr.map(new String(_)).toSeq)
    // non-GFV1 video rows keep the byte-range stub slices
    val stub = sampleFrames(media.filter(_.id == 2L), n = 4).collect()
    assert(stub.length == 4 && stub.forall(_.getLong(0) == 2L))
  }

  test("videoHashes: per-frame aHash equals imageHashes of the stills; undecodable frames dropped") {
    val stills = Seq(noisyPng(seed = 7), noisyPng(seed = 99), noisyPng(seed = 123))
    val media = Seq(
      Media(1, "video", encodeVideo(stills), MediaMeta(None, None, None)),
      Media(2, "video", ("raw-bytes" * 10).getBytes, MediaMeta(None, None, None))).toDS()
    val got = videoHashes(media, n = 3).collect()
    assert(got.forall(_.id == 1L), "stub slices are not decodable images → dropped")
    assert(got.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2))
    val still = stills.zipWithIndex.map { case (png, i) =>
      Media(i.toLong, "image", png, MediaMeta(None, None, None))
    }.toDS()
    val want = imageHashes(still).collect().map(ih => ih.id -> ih.ahash).toMap
    assert(got.forall(h => want(h.frame_idx.toLong) == h.ahash))
    // deterministic across partitionings
    val again = videoHashes(media.repartition(4), n = 3).collect()
    assert(got.sortBy(_.frame_idx).toSeq == again.sortBy(_.frame_idx).toSeq)
  }

  test("nearDupVideoPairs: frame-aligned banding, brute-force ground truth, equi-join plan") {
    def vid(seeds: Seq[Int], flipped: Int = 0): Array[Byte] =
      encodeVideo(seeds.map(sd => noisyPng(seed = sd, flipped = flipped)))
    val media = Seq(
      Media(1, "video", vid(Seq(7, 21, 35, 49)), MediaMeta(None, None, None)),
      Media(2, "video", vid(Seq(7, 21, 35, 49), flipped = 6), MediaMeta(None, None, None)), // light edit
      Media(3, "video", vid(Seq(7, 21, 99, 123)), MediaMeta(None, None, None)), // half shared
      Media(4, "video", vid(Seq(201, 202, 203, 204)), MediaMeta(None, None, None))).toDS()
    val fh = videoHashes(media, n = 4).persist()
    val hs = fh.collect().map(h => (h.id, h.frame_idx) -> h.ahash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // brute-force rollup over the collected per-frame hashes
    def want(minFrames: Int) = (for {
      a <- Seq(1L, 2L, 3L, 4L); b <- Seq(1L, 2L, 3L, 4L) if a < b
      ms = (0 until 4).flatMap { f =>
        val d = ham(hs((a, f)), hs((b, f)))
        if (d <= 3) Some(d.toLong) else None
      } if ms.size >= minFrames
    } yield (a, b, ms.size.toLong, ms.sum)).toSet
    val pairs = nearDupVideoPairs(fh, maxHamming = 3, minFrames = 3)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want(3), s"got=$got want=${want(3)}")
    assert(got.exists { case (a, b, _, _) => (a, b) == (1L, 2L) },
      "the lightly edited copy must match on every frame")
    assert(!got.exists { case (a, b, _, _) => a == 4L || b == 4L })
    // minFrames = 1 admits the half-shared video pair (frames 0-1 shared)
    val loose = nearDupVideoPairs(fh, maxHamming = 3, minFrames = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(loose == want(1))
    assert(loose.exists { case (a, b, _, _) => (a, b) == (1L, 3L) })
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"video near-dup join must stay an equi-join:\n$plan")
    fh.unpersist()
  }

  test("videoOffsetPairs: shifted copy found at its true offset; brute-force vote ground truth") {
    // one 6-still reel; three videos sample 4-frame windows at shifts
    // 0/1/2, a fourth is unrelated
    val reel = (0 until 6).map(t => noisyPng(seed = 300 + t))
    def clip(shift: Int): Array[Byte] = encodeVideo(reel.slice(shift, shift + 4))
    val media = Seq(
      Media(1, "video", clip(0), MediaMeta(None, None, None)),
      Media(2, "video", clip(1), MediaMeta(None, None, None)),
      Media(3, "video", clip(2), MediaMeta(None, None, None)),
      Media(4, "video", encodeVideo((0 until 4).map(t => noisyPng(seed = 900 + t))),
        MediaMeta(None, None, None))).toDS()
    val fh = videoHashes(media, n = 4).persist()
    val got = videoOffsetPairs(fh, maxHamming = 3, minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // brute-force replay of the vote from the collected hashes
    val hs = fh.collect().map(h => (h.id, h.frame_idx) -> h.ahash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val want = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
      votes = (for {
        fa <- 0 until 4; fb <- 0 until 4
        if ham(hs((a, fa)), hs((b, fb))) <= 3
      } yield fb - fa).groupBy(identity).map { case (o, v) => o -> v.size }
      if votes.nonEmpty
      best = votes.toSeq.minBy { case (o, s) => (-s, math.abs(o), o) }
      if best._2 >= 2
    } yield (a, b) -> ((best._1.toLong, best._2.toLong))).toMap
    assert(got == want, s"got=$got want=$want")
    // shift k vs shift k+1 of the same reel: the copy aligns at offset -1
    // with 3 of 4 frames matched
    assert(got((1L, 2L)) == ((-1L, 3L)) && got((2L, 3L)) == ((-1L, 3L)))
    assert(got((1L, 3L)) == ((-2L, 2L)))
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // and the frame-ALIGNED near-dup join misses every shifted pair at
    // minFrames 2 — the case this operator exists for
    val aligned = nearDupVideoPairs(fh, maxHamming = 3, minFrames = 2).collect()
    assert(aligned.isEmpty, s"aligned join must miss shifted copies: ${aligned.toSeq}")
    fh.unpersist()
  }

  test("metaOnly never reads the binary column (scan prunes bytes)") {
    val dir = tmpDir("media")
    sampleMedia.toDF().write.mode("overwrite").parquet(dir)
    val plan = metaOnly(spark.read.parquet(dir)).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("bytes"), s"bytes column not pruned:\n$plan")
  }
}
