package graft.sources

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM RIFF/AVI muxer + demuxer: round-trips for both codecs
  * (uncompressed DIB losslessly, MJPG through the JDK's JPEG codec),
  * a HAND-BUILT reference container (independent of the muxer, so the
  * two can't share a wrong assumption about the format), word
  * alignment, and garbage rejection.
  */
class AviSpec extends AnyFunSuite {

  private def grid(seed: Long, w: Int, h: Int): BufferedImage =
    Multimodal.renderGridImage(seed, w, h)

  private def pixels(img: BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xffffff

  test("DIB round-trip is lossless, frames in order, odd widths pad") {
    // w=81 -> row bytes 243, padded to 244: exercises row padding AND
    // odd-length chunk word alignment
    val frames = (0 until 5).map(i => grid(i * 7L + 1, 81, 48))
    val avi = Avi.mux(frames, "DIB ")
    val out = Avi.demux(avi).get
    assert(out.size == 5)
    out.zip(frames).foreach { case (bytes, orig) =>
      val img = Multimodal.decodeImage(bytes).get
      assert(img.getWidth == 81 && img.getHeight == 48)
      assert(pixels(img) == pixels(orig), "DIB must be bit-exact")
    }
  }

  test("MJPG round-trip: every frame decodes via ImageIO at full size") {
    val frames = (0 until 4).map(i => grid(100L + i, 72, 64))
    val avi = Avi.mux(frames, "MJPG")
    val out = Avi.demux(avi).get
    assert(out.size == 4)
    out.foreach { bytes =>
      // a real JPEG: SOI marker + JDK-decodable
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      val img = Multimodal.decodeImage(bytes).get
      assert(img.getWidth == 72 && img.getHeight == 64)
    }
  }

  test("hand-built minimal AVI (independent writer) demuxes") {
    // one 2x2 DIB frame written byte-by-byte from the spec, NOT via
    // Avi.mux: RIFF(AVI (LIST(hdrl avih LIST(strl strh strf))
    // LIST(movi 00db) idx1))
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // 2x2 BGR24 bottom-up, rows padded to 8 bytes: bottom row is
    // red,green — top row blue,white
    val pix = Array[Byte](
      0, 0, -1, 0, -1, 0, 0, 0, // red(0,0,255->BGR 0,0,ff) green, pad
      -1, 0, 0, -1, -1, -1, 0, 0) // blue, white, pad
    val strf = le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = cc("vids") ++ cc("DIB ") ++ le32(0) ++ le16(0) ++
      le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++ le32(1) ++
      le32(16) ++ le32(0xffffffffL) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(2) ++ le16(2)
    val avih = le32(40000) ++ le32(400) ++ le32(0) ++ le32(0x10) ++
      le32(1) ++ le32(0) ++ le32(1) ++ le32(16) ++ le32(2) ++ le32(2) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    def chunk(id: String, b: Array[Byte]) = cc(id) ++ le32(b.length) ++ b
    def list(kind: String, b: Array[Byte]) =
      cc("LIST") ++ le32(b.length + 4L) ++ cc(kind) ++ b
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val movi = list("movi", chunk("00db", pix))
    val idx1 = chunk("idx1", cc("00db") ++ le32(0x10) ++ le32(4) ++
      le32(pix.length))
    val body = cc("AVI ") ++ hdrl ++ movi ++ idx1
    val avi = cc("RIFF") ++ le32(body.length.toLong) ++ body

    val frames = Avi.demux(avi).get
    assert(frames.size == 1)
    val img = Multimodal.decodeImage(frames.head).get
    assert(img.getWidth == 2 && img.getHeight == 2)
    // top-left blue, top-right white, bottom-left red, bottom-right green
    assert((img.getRGB(0, 1) & 0xffffff) == 0xff0000)
    assert((img.getRGB(1, 1) & 0xffffff) == 0x00ff00)
    assert((img.getRGB(0, 0) & 0xffffff) == 0x0000ff)
    assert((img.getRGB(1, 0) & 0xffffff) == 0xffffff)
  }

  test("garbage and non-AVI payloads demux to None") {
    assert(Avi.demux(Array.empty[Byte]).isEmpty)
    assert(Avi.demux("not a container at all".getBytes).isEmpty)
    assert(Avi.demux(Multimodal.encodeFrames(
      Seq(Array[Byte](1, 2, 3)))).isEmpty)
    // truncated AVI: header only, no frames
    val real = Avi.mux(Seq(grid(1L, 36, 24)), "DIB ")
    assert(Avi.demux(real.take(40)).isEmpty)
  }

  test("decodeFrames routes AVI payloads transparently") {
    val frames = (0 until 3).map(i => grid(i.toLong, 45, 32))
    val viaAvi = Multimodal.decodeFrames(Avi.mux(frames, "DIB ")).get
    assert(viaAvi.size == 3)
    // legacy container still demuxes through the same seam
    val legacy = Multimodal.decodeFrames(Multimodal.encodeFrames(
      frames.map(f => {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(f, "png", bos)
        bos.toByteArray
      }))).get
    assert(legacy.size == 3)
    // and the per-frame fingerprints agree between containers
    val hA = viaAvi.map(b =>
      Multimodal.dHash64(Multimodal.decodeImage(b).get))
    val hL = legacy.map(b =>
      Multimodal.dHash64(Multimodal.decodeImage(b).get))
    assert(hA == hL, "lossless containers must fingerprint identically")
  }
}
