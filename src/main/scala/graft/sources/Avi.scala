package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Minimal pure-JVM RIFF/AVI writer + demuxer for the multimodal
  * video seam — the real public container format (Microsoft RIFF AVI:
  * little-endian fourcc chunks, `LIST hdrl` headers, `LIST movi`
  * frame chunks, `idx1` index) replacing the synthetic
  * length-prefixed frame list as the on-disk shape. Two video
  * codecs, both fully decodable with the JDK alone:
  *
  *  - `MJPG` (Motion JPEG, `00dc` chunks): each chunk is one complete
  *    JPEG image — the most common intra-only AVI payload in the
  *    wild;
  *  - `DIB ` (uncompressed bitmap, `00db` chunks): raw bottom-up
  *    BGR24 rows padded to 4 bytes — lossless, so per-frame
  *    perceptual fingerprints stay bit-deterministic across container
  *    round-trips (the property the oracle-exact video queries need;
  *    JPEG would perturb near-tie gradient bits).
  *
  * [[demux]] returns per-frame byte arrays `ImageIO` decodes
  * directly: MJPG frames pass through as JPEG files; DIB frames get a
  * 14-byte `BITMAPFILEHEADER` stitched in front of the stream's own
  * `BITMAPINFOHEADER` — a standard `.bmp` file, zero re-encode.
  *
  * Scale note: both directions are single-pass over one payload and
  * run inside the narrow per-partition decode loops
  * ([[Multimodal.videoFrameHashes]]); payloads never shuffle.
  */
private[graft] object Avi {

  // ----- little-endian byte helpers ---------------------------------

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private final class Out {
    val bos = new ByteArrayOutputStream()
    def bytes(xs: Array[Byte]): Unit = bos.write(xs)
    def cc(s: String): Unit = { require(s.length == 4); bos.write(s.getBytes("US-ASCII")) }
    def le32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
    }
    def size: Int = bos.size()
    def result(): Array[Byte] = bos.toByteArray
  }

  /** Raw bottom-up BGR24 DIB pixel data (rows padded to 4 bytes). */
  private def dibData(img: BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val rowBytes = (w * 3 + 3) & ~3
    val out = new Array[Byte](rowBytes * h)
    var y = 0
    while (y < h) {
      val dstRow = (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(dstRow + x * 3) = (rgb & 0xff).toByte // B
        out(dstRow + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte // G
        out(dstRow + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def jpegData(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    // getRGB path guarantees a 3-band image for the JPEG writer
    val rgb = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_RGB)
    val g = rgb.createGraphics()
    try g.drawImage(img, 0, 0, null) finally g.dispose()
    javax.imageio.ImageIO.write(rgb, "jpg", bos)
    bos.toByteArray
  }

  /** Build a standard single-video-stream AVI from frames. `codec` is
    * `"DIB "` (lossless, `00db` chunks) or `"MJPG"` (`00dc` chunks).
    * All frames must share the first frame's dimensions (the stream
    * header declares one size — the AVI contract).
    */
  def mux(frames: Seq[BufferedImage], codec: String): Array[Byte] = {
    require(codec == "DIB " || codec == "MJPG", s"codec $codec")
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "all frames in one AVI stream share the declared dimensions")
    val isDib = codec == "DIB "
    val chunkId = if (isDib) "00db" else "00dc"
    val datas = frames.map(f => if (isDib) dibData(f) else jpegData(f))
    val maxData = datas.map(_.length).max

    // LIST movi body (frame chunks, word-aligned) + idx1 entries
    val movi = new Out
    movi.cc("movi")
    val idxEntries = datas.map { d =>
      val off = movi.size - 4 // offset relative to after "movi" + 4
                              // (convention: from the 'movi' fourcc)
      movi.cc(chunkId); movi.le32(d.length); movi.bytes(d)
      if (d.length % 2 == 1) movi.bos.write(0) // word alignment
      (off + 4, d.length)
    }

    val strf = new Out // BITMAPINFOHEADER
    strf.le32(40); strf.le32(w); strf.le32(h); strf.le16(1)
    strf.le16(24)
    strf.le32(if (isDib) 0L else 0x47504a4dL) // BI_RGB / 'MJPG'
    strf.le32(((w * 3 + 3) & ~3).toLong * h)
    strf.le32(0); strf.le32(0); strf.le32(0); strf.le32(0)

    val strh = new Out
    strh.cc("vids"); strh.cc(if (isDib) "DIB " else "MJPG")
    strh.le32(0); strh.le16(0); strh.le16(0) // flags, prio, language
    strh.le32(0) // initial frames
    strh.le32(1); strh.le32(25) // scale, rate = 25 fps
    strh.le32(0); strh.le32(frames.size.toLong) // start, length
    strh.le32(maxData.toLong) // suggested buffer
    strh.le32(0xffffffffL) // quality (default)
    strh.le32(0) // sample size (varies)
    strh.le16(0); strh.le16(0); strh.le16(w); strh.le16(h) // rcFrame

    val avih = new Out
    avih.le32(40000) // microseconds per frame (25 fps)
    avih.le32(maxData.toLong * 25)
    avih.le32(0) // padding granularity
    avih.le32(0x10) // AVIF_HASINDEX
    avih.le32(frames.size.toLong)
    avih.le32(0) // initial frames
    avih.le32(1) // one stream
    avih.le32(maxData.toLong)
    avih.le32(w.toLong); avih.le32(h.toLong)
    avih.le32(0); avih.le32(0); avih.le32(0); avih.le32(0)

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new Out
      o.cc(id); o.le32(body.length.toLong); o.bytes(body)
      if (body.length % 2 == 1) o.bos.write(0)
      o.result()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new Out
      o.cc("LIST"); o.le32(body.length + 4L); o.cc(kind); o.bytes(body)
      o.result()
    }

    val strl = list("strl",
      chunk("strh", strh.result()) ++ chunk("strf", strf.result()))
    val hdrl = list("hdrl", chunk("avih", avih.result()) ++ strl)

    val idx = new Out
    idx.cc("idx1"); idx.le32(idxEntries.size * 16L)
    idxEntries.foreach { case (off, len) =>
      idx.cc(chunkId); idx.le32(0x10) // AVIIF_KEYFRAME
      idx.le32(off.toLong); idx.le32(len.toLong)
    }

    val moviBytes = movi.result()
    val moviList = {
      val o = new Out
      o.cc("LIST"); o.le32(moviBytes.length.toLong); o.bytes(moviBytes)
      o.result()
    }
    val body = hdrl ++ moviList ++ idx.result()
    val riff = new Out
    riff.cc("RIFF"); riff.le32(body.length + 4L); riff.cc("AVI ")
    riff.bytes(body)
    riff.result()
  }

  /** Extract the video frames of stream 0 as ImageIO-decodable byte
    * arrays (JPEG for `..dc`, BMP-wrapped for `..db`), in container
    * order. None = not an AVI / unparsable (the caller's drop
    * semantics). Tolerant single pass: walks chunks, recurses into
    * LISTs, keeps the first `strf` as the DIB header and every
    * `00db`/`00dc` chunk's data.
    */
  def demux(payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
          fourcc(payload, 8) != "AVI ") return None
      var strf: Option[Array[Byte]] = None
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(payload, p)
          val len = u32(payload, p + 4).toInt
          val dataStart = p + 8
          if (len < 0 || dataStart + len > end) return // truncated
          if (id == "LIST" && len >= 4) {
            walk(dataStart + 4, dataStart + len) // skip list kind
          } else if (id == "strf" && strf.isEmpty) {
            strf = Some(java.util.Arrays.copyOfRange(
              payload, dataStart, dataStart + len))
          } else if (id.startsWith("00") &&
              (id.endsWith("db") || id.endsWith("dc")) && len > 0) {
            val data = java.util.Arrays.copyOfRange(
              payload, dataStart, dataStart + len)
            frames += (if (id.endsWith("dc")) data
              else wrapBmp(strf.getOrElse(return), data))
          }
          p = dataStart + len + (len & 1) // word alignment
        }
      }
      // RIFF size counts from offset 8 (the "AVI " tag onward)
      walk(12, math.min(payload.length, 8 + u32(payload, 4).toInt))
      if (frames.isEmpty) None else Some(frames.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Stitch a BITMAPFILEHEADER onto (BITMAPINFOHEADER, pixel data) —
    * a standard .bmp ImageIO reads natively.
    */
  private def wrapBmp(bi: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val o = new Out
    val headerLen = 14 + bi.length
    o.bos.write('B'); o.bos.write('M')
    o.le32(headerLen + data.length.toLong)
    o.le16(0); o.le16(0)
    o.le32(headerLen.toLong)
    o.bytes(bi); o.bytes(data)
    o.result()
  }
}
