package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal.MediaRow

/** Frame-level video pipeline: container round-trip, real per-frame
  * PNG decode, and frame-voting near-dedup robust to scale + clip.
  */
class MultimodalVideoSpec extends SparkSpec {

  import spark.implicits._

  private def video(id: Long, group: Long, w: Int, h: Int,
      clip: Int, nFrames: Int = 12): MediaRow = {
    val frames = (clip until nFrames).map(i =>
      Multimodal.encodePng(
        Multimodal.renderGridImage(group * 1000L + i, w, h)))
    MediaRow(id, "video", Multimodal.encodeFrames(frames), w, h, 0,
      frames.size)
  }

  test("container round-trips; frames decode as real PNGs") {
    val v = video(1L, 7L, 90, 80, clip = 0)
    val frames = Multimodal.decodeFrames(v.payload).get
    assert(frames.size == 12)
    frames.zipWithIndex.foreach { case (f, i) =>
      val img = Multimodal.decodeImage(f).get
      assert(img.getWidth == 90 && img.getHeight == 80)
      assert(Multimodal.dHash64(img) == Multimodal.groupBits(7000L + i))
    }
    assert(Multimodal.decodeFrames("junk".getBytes).isEmpty)
  }

  test("frame voting matches scale-variant, clipped duplicates only") {
    val rows = Seq(
      video(1L, 5L, 90, 80, clip = 0),
      video(2L, 5L, 9 * 11, 8 * 9, clip = 2),  // rescaled + clipped
      video(3L, 9L, 90, 80, clip = 0))          // different content
    val near = Multimodal.videoNearDups(rows.toDS(), minSharedFrames = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(near == Set((1L, 2L, 10L)), s"got $near")
    // a high threshold excludes the clipped pair
    val strict = Multimodal.videoNearDups(rows.toDS(),
      minSharedFrames = 11).count()
    assert(strict == 0)
  }

  test("frame stride samples every k-th frame") {
    val v = video(1L, 3L, 90, 80, clip = 0)
    val hashes = Multimodal.videoFrameHashes(Seq(v).toDS(), stride = 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(hashes.map(_._2) == Set(0, 4, 8))
  }
}
