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

  test("frame sampling: every stride-th frame, declarative") {
    val sampled = Multimodal.sampleFrames(media.toDF(), stride = 10)
    val row = sampled.select($"media_id", $"n_frames", $"n_sampled")
      .as[(Long, Int, Int)].head()
    assert(row._3 == (row._2 + 9) / 10)
  }
}
