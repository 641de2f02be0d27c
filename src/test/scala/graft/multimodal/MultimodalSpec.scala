package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = genMedia(spark, rows = 500, parts = 4).cache()

  test("schema: binary payload + typed metadata struct") {
    val sch = media.toDF().schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
  }

  test("codec round trip: image payloads are REAL P5 files that re-decode") {
    val rows = media.filter(col("kind") === "image").limit(10).collect()
    rows.foreach { r =>
      assert(Netpbm.isNetpbm(r.payload))
      val img = Netpbm.decode(r.payload)
      assert(img.format == "P5" && img.width == r.meta.width && img.height == r.meta.height)
      assert(img.raster.length == img.width * img.height)
      // raster content is the deterministic per-id pixel stream
      assert(java.util.Arrays.equals(img.raster,
        StubCodec.pixelBytes(r.media_id, img.width * img.height)))
    }
  }

  test("netpbm golden images: exact bytes, spec-parser header handling") {
    // golden 2x2 P5: fixed-width header + raster 00 7f 80 ff
    val raster = Array[Byte](0x00, 0x7f, 0x80.toByte, 0xff.toByte)
    val enc = Netpbm.encodeP5(2, 2, raster)
    val expected = "P5\n00002 00002\n255\n".getBytes("US-ASCII") ++ raster
    assert(java.util.Arrays.equals(enc, expected))
    assert(enc.length == Netpbm.HeaderLen + 4)
    // decoder accepts ANY conformant header: comments, loose whitespace
    val loose = "P5 # a comment\n  2\t2 # dims\n255\n".getBytes("US-ASCII") ++ raster
    val img = Netpbm.decode(loose)
    assert(img.width == 2 && img.height == 2)
    assert(java.util.Arrays.equals(img.raster, raster))
    // P6 RGB: pure red/green/blue/white → BT.601 luma bytes
    val rgb = Array[Byte](
      0xff.toByte, 0, 0, 0, 0xff.toByte, 0,
      0, 0, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    val p6 = Netpbm.decode(Netpbm.encodeP6(2, 2, rgb))
    assert(p6.gray.map(_ & 0xff).toSeq == Seq(
      255 * 299 / 1000, 255 * 587 / 1000, 255 * 114 / 1000, 255))
    // malformed: truncated raster, maxval > 255, bad magic
    intercept[IllegalArgumentException](Netpbm.decode("P5\n2 2\n255\n\u0000".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](Netpbm.decode(("P5\n2 2\n65535\n" + "\u0000" * 8).getBytes("US-ASCII")))
    intercept[IllegalArgumentException](Netpbm.decode("P4\n2 2\n".getBytes("US-ASCII")))
  }

  test("decode stage: typed output, mean luma and histogram sane") {
    val dec = decodeImages(media).collect()
    assert(dec.nonEmpty)
    dec.foreach { d =>
      assert(d.meanLuma >= 0 && d.meanLuma <= 255)
      assert(d.histogram.length == 16)
      assert(math.abs(d.histogram.sum - 1.0f) < 1e-3)
    }
  }

  test("resize: output dims change, non-images untouched") {
    val out = resizeImages(media, 4, 4).collect()
    out.filter(_.kind == "image").foreach { r =>
      assert(r.meta.width == 4 && r.meta.height == 4)
      val img = Netpbm.decode(r.payload)
      assert(img.width == 4 && img.height == 4 && img.raster.length == 16)
    }
    val origAudio = media.filter(col("kind") === "audio").count()
    assert(out.count(_.kind == "audio").toLong == origAudio)
  }

  test("frame sampling halves video frames (stride 2)") {
    val out = sampleFrames(media, 2).filter(col("kind") === "video").as[MediaRow].collect()
    val orig = media.filter(col("kind") === "video").as[MediaRow].collect()
      .map(r => r.media_id -> r.meta.nFrames).toMap
    out.foreach { r =>
      assert(r.meta.nFrames == (orig(r.media_id) + 1) / 2)
      val (_, w, h, _, frames, body) = StubCodec.decode(r.payload)
      assert(body.length == w * h * frames)
    }
  }

  test("generator is partitioning-invariant") {
    def digest(parts: Int) = genMedia(spark, 200, parts).toDF()
      .agg(expr("bit_xor(xxhash64(media_id, kind, payload))")).as[Long].head()
    assert(digest(2) == digest(13))
  }

  test("decode preserves partitioning (no shuffle in the plan)") {
    val plan = decodeImages(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("feature path: extracted histograms feed ANN without payload") {
    val feats = decodeImages(media).select(col("media_id").as("vec_id"),
      col("histogram").as("embedding"))
    val q = feats.limit(2)
    val knn = graft.sim.Similarity.bruteForceTopK(feats, q,
      col("vec_id"), col("embedding"), k = 3)
    assert(knn.count() == q.count() * 3)
  }
}

class WavSpec extends graft.SparkSpec {
  import spark.implicits._

  test("wav round trip: canonical header, sample-exact") {
    val samples = Array.tabulate(480)(i => ((i * 37 - 8000) % 32768).toShort)
    val bytes = Wav.encodePcm16(16000, 1, samples)
    assert(bytes.length == Wav.HeaderLen + samples.length * 2)
    val a = Wav.decode(bytes)
    assert(a.sampleRate == 16000 && a.channels == 1)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("decoder is a chunk walker: unknown chunks and pad bytes are skipped") {
    val samples = Array[Short](100, -200, 300, -400)
    val canonical = Wav.encodePcm16(8000, 1, samples)
    // splice a 3-byte LIST chunk (odd length -> pad byte) between fmt and data
    val bb = java.nio.ByteBuffer.allocate(canonical.length + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(canonical, 0, 36)                       // RIFF..fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)  // unknown chunk, odd len
    bb.put(Array[Byte](1, 2, 3, 0))                // 3 bytes + pad
    bb.put(canonical, 36, canonical.length - 36)   // data chunk
    val a = Wav.decode(bb.array())
    assert(a.samples.toSeq == samples.toSeq && a.sampleRate == 8000)
  }

  test("decoder rejects malformed payloads with IllegalArgumentException") {
    val good = Wav.encodePcm16(8000, 1, Array[Short](1, 2))
    assertThrows[IllegalArgumentException](Wav.decode("nope".getBytes()))
    assertThrows[IllegalArgumentException](Wav.decode(good.take(10)))
    val nonPcm = good.clone(); nonPcm(20) = 3 // fmt tag != 1 (IEEE float)
    assertThrows[IllegalArgumentException](Wav.decode(nonPcm))
    // chunk length overrunning the payload must not read out of bounds
    val overrun = good.clone()
    val bb = java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue) // data chunk length
    assertThrows[IllegalArgumentException](Wav.decode(overrun))
  }

  test("audio decode features match a scala re-computation") {
    val media = Multimodal.genMedia(spark, rows = 200, parts = 4)
    val feats = Multimodal.decodeAudio(media).collect()
    assert(feats.nonEmpty)
    feats.take(10).foreach { f =>
      val row = media.filter(_.media_id == f.media_id).head()
      val a = Wav.decode(row.payload)
      val n = a.samples.length
      assert(f.n_samples == n && f.sample_rate == 16000)
      val rms = math.sqrt(a.samples.map(s => s.toDouble * s).sum / n)
      assert(math.abs(f.rms - rms) < 1e-9)
      assert(f.zcr >= 0.0 && f.zcr <= 1.0)
    }
  }

  test("resample halves the sample count and keeps non-audio untouched") {
    val media = Multimodal.genMedia(spark, rows = 200, parts = 4)
    val out = Multimodal.resampleAudio(media, 8000).collect()
    out.filter(_.kind == "audio").take(5).foreach { r =>
      val a = Wav.decode(r.payload)
      assert(a.sampleRate == 8000 && r.meta.sampleRate == 8000)
      val orig = Wav.decode(media.filter(_.media_id == r.media_id).head().payload)
      assert(a.samples.length == orig.samples.length / 2)
      // nearest-neighbor: every output sample exists at the mapped position
      assert(a.samples.toSeq == (0 until a.samples.length)
        .map(i => orig.samples(i * 2)).toSeq)
    }
    val imgs = media.filter(_.kind == "image").count()
    assert(out.count(_.kind == "image").toLong == imgs)
  }

  test("aHash: invariant under nearest-neighbor resize; discriminative across images") {
    val imgs = Multimodal.genMedia(spark, rows = 600, parts = 4)
      .filter(_.kind == "image")
    val orig = Multimodal.imageAHash(imgs).collect()
      .map(r => r.media_id -> r.ahash).toMap
    // the 8×8 sample grid composes exactly through the resize formula, so
    // an image and its 16×16 resized copy hash IDENTICALLY — the property
    // that makes exact hash-groupBy a perceptual near-dup detector
    val resized = Multimodal.imageAHash(Multimodal.resizeImages(imgs, 16, 16))
      .collect().map(r => r.media_id -> r.ahash).toMap
    assert(orig.keySet == resized.keySet && orig.nonEmpty)
    orig.foreach { case (id, h) => assert(resized(id) == h, s"id=$id") }
    // and a second, non-multiple-of-8 resize still matches for most images
    // (floor composition is exact when 8 | W'; 24 also satisfies it)
    val r24 = Multimodal.imageAHash(Multimodal.resizeImages(imgs, 24, 24))
      .collect().map(r => r.media_id -> r.ahash).toMap
    orig.foreach { case (id, h) => assert(r24(id) == h, s"24px id=$id") }
    // hash-random pixels: distinct images get distinct hashes (64 bits)
    val distinct = orig.values.toSet.size
    assert(distinct > orig.size * 9 / 10, s"$distinct of ${orig.size}")
    // every hash is a 64-char bit string
    orig.values.foreach(h => assert(h.length == 64 && h.forall(c => c == '0' || c == '1')))
  }
}
