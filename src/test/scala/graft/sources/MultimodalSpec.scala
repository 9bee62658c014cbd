package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media =
    Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001/documents.parquet")

  test("synthetic media table has typed payload + metadata") {
    val row = media.filter($"media_id" === 0L).head()
    assert(row.kind == "image")
    assert(row.payload.nonEmpty)
    assert(row.width >= 32 && row.height >= 32)
  }

  test("feature extraction: one narrow pass, stable schema, deterministic") {
    val feats = Multimodal.extractFeatures(media)
    val a = feats.filter($"media_id" === 1L).head()
    val b = Multimodal.extractFeatures(media).filter($"media_id" === 1L).head()
    assert(a.checksum == b.checksum) // deterministic stub
    assert(a.feature.length == Multimodal.FeatureDim)
    assert(math.abs(a.feature.sum - 1.0f) < 1e-3) // normalized histogram
    assert(a.n_bytes > 0)
    // payload must NOT flow downstream
    assert(!feats.schema.fieldNames.contains("payload"))
  }

  test("resize: images bounded by maxSide with aspect preserved, others untouched") {
    val resized = Multimodal.resizeImages(media, maxSide = 64)
    val images = resized.filter($"kind" === "image").collect()
    assert(images.nonEmpty)
    assert(images.forall(r => r.width <= 64 && r.height <= 64))
    // aspect preserved within integer truncation
    val orig = media.filter($"kind" === "image").collect()
      .map(r => r.media_id -> r).toMap
    images.foreach { r =>
      val o = orig(r.media_id)
      if (math.max(o.width, o.height) > 64) {
        val expected = math.min(1.0, 64.0 / math.max(o.width, o.height))
        assert(math.abs(r.width - o.width * expected) <= 1)
        assert(r.payload.length <= o.payload.length)
      } else {
        assert(r.width == o.width && r.height == o.height)
      }
    }
    // non-image rows pass through byte-identical
    val audio = resized.filter($"kind" === "audio").head()
    val audioOrig = media.filter($"media_id" === lit(audio.media_id)).head()
    assert(audio.payload.sameElements(audioOrig.payload))
  }

  test("frame sampling: every stride-th frame, declarative") {
    val sampled = Multimodal.sampleFrames(media.toDF(), stride = 10)
    val row = sampled.select($"media_id", $"n_frames", $"n_sampled")
      .as[(Long, Int, Int)].head()
    assert(row._3 == (row._2 + 9) / 10)
  }
}
