package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Mix

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * IMAGES use a REAL codec: [[Netpbm]] (P5/P6, the public Netpbm binary
  * formats); AUDIO uses a REAL codec too: [[Wav]] (RIFF/WAVE PCM16 —
  * canonical encode, chunk-walking spec decode). Both genuine, pure JVM.
  * Video stays behind [[StubCodec]], a deterministic fake that round-trips
  * a self-describing layout — every real video format is a compressed
  * container needing codec libraries this environment lacks, and that
  * boundary is documented where a real integration (e.g. JavaCV) would
  * slot in. Everything around the codecs is real and is the part that
  * matters at 100 TB:
  *
  *  - schema: `(media_id long, kind string, payload binary, meta struct)`,
  *    media bytes NEVER pass through a shuffle unless the operator needs
  *    them to (decode/resize are narrow maps);
  *  - batch shape: `mapPartitions` over iterator batches of
  *    [[Multimodal.BatchSize]] rows — the JVM analog of a vectorized
  *    (Arrow-batched) UDF, amortizing per-batch codec setup;
  *  - partitioning: payloads are large, so ops preserve the input
  *    partitioning; only extracted (small) features may shuffle.
  */
object Multimodal {

  /** Rows per codec batch (vectorized-UDF batch analog). */
  val BatchSize = 256

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                             nFrames: Int, format: String)
  final case class MediaRow(media_id: Long, kind: String,
                            payload: Array[Byte], meta: MediaMeta)
  final case class DecodedImage(media_id: Long, width: Int, height: Int,
                                meanLuma: Double, histogram: Array[Float])
  final case class DecodedAudio(media_id: Long, sample_rate: Int,
                                n_samples: Int, rms: Double, zcr: Double)

  /** Deterministic fake codec for AUDIO/VIDEO payloads. Layout
    * (big-endian): magic "GRFT"(4) | kind(1) | width(4) | height(4) |
    * sampleRate(4) | nFrames(4) | pixel/sample bytes (hash-derived).
    *
    * ??? REAL-CODEC BOUNDARY: `decode`/`encode` below are the two methods a
    * real video integration replaces (e.g. JavaCV). Images ([[Netpbm]])
    * and audio ([[Wav]]) already crossed this boundary. The byte-plumbing, schema and
    * batching around the codec stay unchanged either way.
    */
  object StubCodec {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")
    private val KindCodes = Map("image" -> 1.toByte, "audio" -> 2.toByte, "video" -> 3.toByte)
    private val CodeKinds = KindCodes.map(_.swap)

    def encode(id: Long, kind: String, w: Int, h: Int, rate: Int, frames: Int): Array[Byte] = {
      val body = pixelBytes(id, w * h * math.max(frames, 1))
      val bb = java.nio.ByteBuffer.allocate(21 + body.length)
      bb.put(Magic).put(KindCodes(kind)).putInt(w).putInt(h).putInt(rate).putInt(frames)
      bb.put(body).array()
    }

    /** Hash-derived fake pixel/sample content — deterministic per id. */
    def pixelBytes(id: Long, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = (Mix.mix64(id * 7919L + i) & 0xFF).toByte; i += 1 }
      out
    }

    def decode(payload: Array[Byte]): (String, Int, Int, Int, Int, Array[Byte]) = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      val magic = new Array[Byte](4); bb.get(magic)
      require(java.util.Arrays.equals(magic, Magic), "bad magic")
      val kind = CodeKinds(bb.get())
      val (w, h, rate, frames) = (bb.getInt, bb.getInt, bb.getInt, bb.getInt)
      val body = new Array[Byte](bb.remaining()); bb.get(body)
      (kind, w, h, rate, frames, body)
    }
  }

  /** Deterministic synthetic media table (no external data): dims/kind are
    * pure functions of `media_id` — identical at any parallelism.
    */
  def genMedia(spark: SparkSession, rows: Long, parts: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, rows, 1, parts).as[Long].map { id =>
      val kind = Seq("image", "audio", "video")(Mix.bounded(0x3D1A, id, 1, 3))
      val w = 8 + Mix.bounded(0x3D1B, id, 2, 24)
      val h = 8 + Mix.bounded(0x3D1C, id, 3, 24)
      val rate = if (kind == "audio") 16000 else 0
      val frames = if (kind == "video") 2 + Mix.bounded(0x3D1D, id, 4, 6) else 1
      if (kind == "image")
        // real P5 (PGM) payload — hash-derived but spec-conformant pixels
        MediaRow(id, kind, Netpbm.encodeP5(w, h, StubCodec.pixelBytes(id, w * h)),
          MediaMeta(w, h, rate, frames, "pgm"))
      else if (kind == "audio")
        // real RIFF/WAVE PCM16 payload — hash-derived mono samples
        MediaRow(id, kind,
          Wav.encodePcm16(rate, 1, sampleShorts(id, w * h)),
          MediaMeta(w, h, rate, frames, "wav"))
      else
        MediaRow(id, kind, StubCodec.encode(id, kind, w, h, rate, frames),
          MediaMeta(w, h, rate, frames, "grft"))
    }
  }

  /** Deterministic hash-derived int16 PCM samples (the audio analog of
    * [[StubCodec.pixelBytes]]) — pure function of `id`.
    */
  def sampleShorts(id: Long, n: Int): Array[Short] = {
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = (Mix.mix64(id * 104729L + i) & 0xFFFF).toShort; i += 1 }
    out
  }

  /** Audio decode stage: narrow `mapPartitions` over the real [[Wav]]
    * codec; emits the curation features an audio pipeline gates on (RMS
    * level for silence/clipping screens, zero-crossing rate as a crude
    * voicing/noise signal). Payload dropped — features shuffle, media
    * bytes don't.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val a = Wav.decode(row.payload)
          val n = a.samples.length
          var sumSq = 0.0
          var zc = 0
          var i = 0
          while (i < n) {
            val s = a.samples(i).toDouble
            sumSq += s * s
            if (i > 0 && (a.samples(i) < 0) != (a.samples(i - 1) < 0)) zc += 1
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          val zcr = if (n <= 1) 0.0 else zc.toDouble / (n - 1)
          DecodedAudio(row.media_id, a.sampleRate, n, rms, zcr)
        }
      }
    }
  }

  /** Audio resample stage: nearest-neighbor PCM16 resample (mono) — the
    * rate-normalization step before feature extraction; payload in,
    * payload out, narrow map, partitioning preserved.
    */
  def resampleAudio(media: Dataset[MediaRow], newRate: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      if (row.kind != "audio") row
      else {
        val a = Wav.decode(row.payload)
        val outN = (a.samples.length.toLong * newRate / a.sampleRate).toInt
        val out = new Array[Short](outN)
        var i = 0
        while (i < outN) {
          out(i) = a.samples((i.toLong * a.sampleRate / newRate).toInt); i += 1
        }
        row.copy(payload = Wav.encodePcm16(newRate, a.channels, out),
          meta = row.meta.copy(sampleRate = newRate))
      }
    }
  }

  /** Decode stage: narrow `mapPartitions` in codec batches; emits small
    * typed rows (payload dropped — only features survive, so anything
    * downstream shuffles kilobytes, not media bytes).
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch codec init would go here (real codecs amortize setup)
        batch.iterator.map { row =>
          val img = Netpbm.decode(row.payload) // real spec parse
          val body = img.gray
          DecodedImage(row.media_id, img.width, img.height,
            meanLuma(body), histogram16(body))
        }
      }
    }
  }

  /** Resize stage: nearest-neighbor on the fake pixel grid — payload in,
    * payload out, same schema; narrow map, partitioning preserved.
    */
  def resizeImages(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      if (row.kind != "image") row
      else {
        val img = Netpbm.decode(row.payload)
        val (w, h, body) = (img.width, img.height, img.gray)
        val out = new Array[Byte](newW * newH)
        var y = 0
        while (y < newH) {
          var x = 0
          while (x < newW) {
            out(y * newW + x) = body((y * h / newH) * w + (x * w / newW)); x += 1
          }
          y += 1
        }
        row.copy(payload = Netpbm.encodeP5(newW, newH, out),
          meta = row.meta.copy(width = newW, height = newH))
      }
    }
  }

  /** Frame-sample stage: keep every `stride`-th frame of video payloads. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      if (row.kind != "video") row
      else {
        val (_, w, h, rate, frames, body) = StubCodec.decode(row.payload)
        val frameLen = w * h
        val kept = (0 until frames by stride).toArray
        val out = new Array[Byte](frameLen * kept.length)
        kept.zipWithIndex.foreach { case (f, i) =>
          System.arraycopy(body, f * frameLen, out, i * frameLen, frameLen)
        }
        val bb = java.nio.ByteBuffer.allocate(21 + out.length)
        bb.put(StubCodec.Magic).put(3.toByte).putInt(w).putInt(h)
          .putInt(rate).putInt(kept.length).put(out)
        row.copy(payload = bb.array(), meta = row.meta.copy(nFrames = kept.length))
      }
    }
  }

  private def meanLuma(body: Array[Byte]): Double = {
    var s = 0L; var i = 0
    while (i < body.length) { s += (body(i) & 0xFF); i += 1 }
    if (body.isEmpty) 0.0 else s.toDouble / body.length
  }

  /** 16-bucket byte histogram, L1-normalized — the feature-extraction stub
    * (a real model would emit an embedding here); feeds graft.sim ANN.
    */
  def histogram16(body: Array[Byte]): Array[Float] = {
    val h = new Array[Float](16)
    var i = 0
    while (i < body.length) { h((body(i) & 0xFF) >> 4) += 1f; i += 1 }
    if (body.nonEmpty) {
      // divide in DOUBLE then narrow to float: a SQL oracle computes
      // count::DOUBLE / len and casts — float-native division would differ
      // by a double-rounding ulp on some counts
      var j = 0
      while (j < 16) { h(j) = (h(j).toDouble / body.length).toFloat; j += 1 }
    }
    h
  }

  final case class ImageHash(media_id: Long, width: Int, height: Int, ahash: String)

  /** Average-hash (aHash) perceptual fingerprint: nearest-neighbor
    * downsample to 8×8, threshold each sample against the 64-sample mean,
    * emit the 64 bits as a '0'/'1' string (engine-portable; no signed
    * 2^63 overflow games). The standard perceptual near-dup primitive for
    * image corpora: scale/re-encode-invariant by construction — the 8×8
    * sample grid composes EXACTLY through the nearest-neighbor
    * [[resizeImages]] formula (floor((floor(i·W'/8))·W/W') = floor(i·W/8)
    * when 8 | W'), so an image and its resized copy hash identically
    * (MultimodalSpec proves it).
    *
    * Scale shape (10^12 images): fully NARROW — decode + 64 samples + mean
    * per row, no shuffle; near-dup grouping downstream is an exact
    * hash-groupBy (the same map-side-combinable shape as exact text
    * dedup). Pixels never leave the row: only the 64-char hash reaches
    * any downstream exchange.
    */
  def imageAHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val img = Netpbm.decode(row.payload)
          val (w, h, body) = (img.width, img.height, img.gray)
          val px = new Array[Int](64)
          var k = 0
          while (k < 64) {
            px(k) = body((k / 8 * h / 8) * w + (k % 8 * w / 8)) & 0xFF
            k += 1
          }
          val mean = px.sum / 64.0
          val sb = new java.lang.StringBuilder(64)
          k = 0
          while (k < 64) { sb.append(if (px(k) > mean) '1' else '0'); k += 1 }
          ImageHash(row.media_id, w, h, sb.toString)
        }
      }
    }
  }

  /** Media stats per kind — the metadata-path query (no payload shuffle:
    * aggregates project meta fields only; Parquet would prune the binary
    * column entirely).
    */
  def mediaStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF().select(col("media_id"), col("kind"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.nFrames").as("n_frames"), length(col("payload")).as("payload_bytes"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("payload_bytes")).as("total_bytes"),
        // raw full-precision averages — cross-engine rounding alignment is
        // the oracle-comparison layer's job (the DataOpsQueries wrapper)
        avg(col("width")).as("avg_w"),
        avg(col("height")).as("avg_h"),
        sum(col("n_frames")).as("total_frames"))
}
