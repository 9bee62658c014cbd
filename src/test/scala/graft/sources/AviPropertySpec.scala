package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the RIFF/AVI container: over arbitrary frame
  * counts and dimensions (odd widths exercise DIB row padding AND
  * odd-length chunk word alignment), a DIB mux → demux round-trip is
  * pixel-exact in order, and a MJPG round-trip preserves count and
  * dimensions. Any byte-offset slip in the writer or the chunk walk
  * shows up here.
  */
class AviPropertySpec extends AnyFunSuite {

  private def check(p: Prop, minTests: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  private val genShape = for {
    n <- Gen.choose(1, 7)
    w <- Gen.choose(3, 41)
    h <- Gen.choose(3, 33)
    seed <- Gen.choose(0L, 1000000L)
  } yield (n, w, h, seed)

  private def pixels(img: java.awt.image.BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xffffff

  test("DIB round-trip is pixel-exact for arbitrary shapes") {
    check(Prop.forAll(genShape) { case (n, w, h, seed) =>
      val frames = (0 until n).map(i =>
        Multimodal.renderGridImage(seed + i, w, h))
      val out = Avi.demux(Avi.mux(frames, "DIB ")).get
      out.size == n && out.zip(frames).forall { case (bytes, orig) =>
        val img = Multimodal.decodeImage(bytes).get
        img.getWidth == w && img.getHeight == h &&
          pixels(img) == pixels(orig)
      }
    })
  }

  test("MJPG round-trip preserves count and dimensions") {
    check(Prop.forAll(genShape) { case (n, w, h, seed) =>
      val frames = (0 until n).map(i =>
        Multimodal.renderGridImage(seed + i, w, h))
      val out = Avi.demux(Avi.mux(frames, "MJPG")).get
      out.size == n && out.forall { bytes =>
        Multimodal.decodeImage(bytes)
          .exists(img => img.getWidth == w && img.getHeight == h)
      }
    }, minTests = 12)
  }

  test("arbitrary prefixes of a valid AVI never crash the demuxer") {
    val avi = Avi.mux(
      (0 until 3).map(i => Multimodal.renderGridImage(i.toLong, 27, 18)),
      "DIB ")
    check(Prop.forAll(Gen.choose(0, avi.length)) { cut =>
      Avi.demux(avi.take(cut)) // None or partial frames, never a throw
      true
    }, minTests = 40)
  }
}
