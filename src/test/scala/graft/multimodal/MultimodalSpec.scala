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

  test("codec round trip: decode(encode(x)) recovers dims and content") {
    val rows = media.filter(col("kind") === "image").limit(10).collect()
    rows.foreach { r =>
      val (kind, w, h, _, frames, body) = StubCodec.decode(r.payload)
      assert(kind == "image" && w == r.meta.width && h == r.meta.height)
      assert(body.length == w * h * frames)
    }
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
      val (_, w, h, _, _, body) = StubCodec.decode(r.payload)
      assert(w == 4 && h == 4 && body.length >= 16)
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
