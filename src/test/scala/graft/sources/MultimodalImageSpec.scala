package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.sources.Multimodal.MediaRow

/** Real JDK image pipeline: decode (ImageIO), perceptual dHash,
  * scale/re-encode invariance, banded hamming near-dedup with planted
  * bit-flips, and the real resize round-trip.
  */
class MultimodalImageSpec extends SparkSpec {

  import spark.implicits._

  private def png(group: Long, w: Int, h: Int): Array[Byte] =
    Multimodal.encodePng(Multimodal.renderGridImage(group, w, h))

  test("dHash is invariant across member sizes and lossless encodings") {
    val base = Multimodal.decodeImage(png(7L, 90, 80)).get
    val big = Multimodal.decodeImage(png(7L, 9 * 12, 8 * 10)).get
    assert(Multimodal.dHash64(base) == Multimodal.groupBits(7L))
    assert(Multimodal.dHash64(big) == Multimodal.groupBits(7L),
      "scale must not change the fingerprint")
    // BMP re-encode (also lossless, also a JDK codec) — same hash
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(base, "bmp", out)
    val bmp = Multimodal.decodeImage(out.toByteArray).get
    assert(Multimodal.dHash64(bmp) == Multimodal.groupBits(7L),
      "re-encoding must not change the fingerprint")
    // a different group differs
    val other = Multimodal.decodeImage(png(8L, 90, 80)).get
    assert(Multimodal.dHash64(other) != Multimodal.dHash64(base))
  }

  test("decode reads true dimensions; garbage payloads return None") {
    val img = Multimodal.decodeImage(png(3L, 99, 64)).get
    assert(img.getWidth == 99 && img.getHeight == 64)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("banded hamming join finds re-scaled and lightly-edited dups only") {
    // group 5 at three sizes (hamming 0) plus an unrelated group
    val rows = Seq(
      MediaRow(1L, "image", png(5L, 90, 80), 90, 80, 0, 1),
      MediaRow(2L, "image", png(5L, 9 * 11, 8 * 9), 99, 72, 0, 1),
      MediaRow(3L, "image", png(5L, 9 * 13, 8 * 11), 117, 88, 0, 1),
      MediaRow(4L, "image", png(23L, 90, 80), 90, 80, 0, 1))
    val near = Multimodal.imageNearDups(rows.toDS(), maxBits = 3)
      .select($"id_a", $"id_b", $"hamming_bits")
      .as[(Long, Long, Int)].collect().toSet
    assert(near == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)),
      s"got $near")

    // synthetic fingerprints with exact flip counts through the same
    // shared banding kernel: 2 bits match at maxBits=3, 12 don't
    val fp0 = Multimodal.groupBits(5L)
    val fps = Seq((10L, fp0), (11L, fp0 ^ 0x3L), (12L, fp0 ^ 0xfffL))
      .toDF("media_id", "dhash")
    val pairs = Dedup.fingerprintNearDups(fps, "media_id", "dhash", 3)
      .select($"id_a", $"id_b", $"hamming_bits")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((10L, 11L, 2)), s"got $pairs")
  }

  test("real resize: decode -> scale -> re-encode round-trips with true dims") {
    val row = MediaRow(1L, "image", png(9L, 108, 80), 108, 80, 0, 1)
    val resized = Multimodal.resizeImages(Seq(row).toDS(), maxSide = 48)
      .collect().head
    // fitBox(108, 80, 48): scale = 48/108, nw = 48, nh = floor(80*48/108)
    assert(resized.width == 48 && resized.height == 35,
      s"got ${resized.width}x${resized.height}")
    val back = Multimodal.decodeImage(resized.payload).get
    assert(back.getWidth == 48 && back.getHeight == 35)
    // content survives: the resized image is still a left-to-right
    // gradient field, not noise — its dHash shares most bits with the
    // original (bilinear downscale of 10px blocks keeps most signs)
    val origHash = Multimodal.groupBits(9L)
    val ham = java.lang.Long.bitCount(
      Multimodal.dHash64(back) ^ origHash)
    assert(ham <= 16, s"resize destroyed perceptual content: $ham bits")
    // audio rows pass through untouched
    val audio = MediaRow(2L, "audio", Array[Byte](1, 2, 3), 0, 0, 16000, 1)
    val out = Multimodal.resizeImages(Seq(audio).toDS(), 48).collect().head
    assert(out.payload.toSeq == Seq[Byte](1, 2, 3))
  }

  test("extractFeatures decodes real images; stub only for non-images") {
    val rows = Seq(
      MediaRow(1L, "image", png(2L, 90, 80), 90, 80, 0, 1),
      MediaRow(2L, "audio", "wavish-bytes".getBytes, 0, 0, 16000, 1))
    val feats = Multimodal.extractFeatures(rows.toDS()).collect()
      .map(f => f.media_id -> f).toMap
    // image histogram sums to ~1 over DECODED pixels
    assert(math.abs(feats(1L).feature.sum - 1f) < 1e-3)
    // deterministic: same image, same checksum
    val again = Multimodal.extractFeatures(
      Seq(rows.head).toDS()).collect().head
    assert(again.checksum == feats(1L).checksum)
    // audio took the stub path (payload-derived)
    val (stubSum, _) = (Multimodal.decodeStub("wavish-bytes".getBytes)._1,
      ())
    assert(feats(2L).checksum == stubSum)
  }

  test("incremental image index: O(new) probing matches from-scratch") {
    val dir = tmpDir("img-index")
    val corpus = Seq(
      MediaRow(1L, "image", png(10L, 90, 80), 90, 80, 0, 1),
      MediaRow(2L, "image", png(11L, 90, 80), 90, 80, 0, 1),
      MediaRow(3L, "image", png(12L, 90, 80), 90, 80, 0, 1))
    Multimodal.writeImageIndex(corpus.toDS(), dir)
    // new batch: a rescaled dup of indexed #2, a fresh unique, and an
    // exact within-batch pair
    val batch = Seq(
      MediaRow(100L, "image", png(11L, 9 * 12, 8 * 10), 108, 80, 0, 1),
      MediaRow(101L, "image", png(50L, 90, 80), 90, 80, 0, 1),
      MediaRow(102L, "image", png(51L, 90, 80), 90, 80, 0, 1),
      MediaRow(103L, "image", png(51L, 9 * 9, 8 * 9), 81, 72, 0, 1))
    val pairs = Multimodal.dedupNewImages(batch.toDS(), dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 100L), (102L, 103L)), s"got $pairs")
    // accept + append; the next batch matches against the grown index
    Multimodal.appendNewImages(batch.toDS(), dir)
    val next = Seq(
      MediaRow(200L, "image", png(50L, 9 * 10, 8 * 10), 90, 80, 0, 1))
    val p2 = Multimodal.dedupNewImages(next.toDS(), dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p2 == Set((101L, 200L)), s"got $p2")
  }

  test("syntheticImages renders decodable PNGs with formula sizes") {
    val sample = Multimodal.syntheticImages(spark,
      "/root/testdata/sf0.001/documents.parquet").collect()
    assert(sample.nonEmpty)
    sample.take(5).foreach { m =>
      val img = Multimodal.decodeImage(m.payload).get
      assert(img.getWidth == 9 * (8 + (m.media_id % 5)).toInt)
      assert(img.getHeight == 8 * (8 + (m.media_id % 3)).toInt)
      assert(Multimodal.dHash64(img) ==
        Multimodal.groupBits(m.media_id % 97))
    }
  }
}
