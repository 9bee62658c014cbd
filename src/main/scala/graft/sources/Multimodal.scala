package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and batched decode /
  * feature-extract operators.
  *
  * IMAGES are decoded for real with `javax.imageio` (PNG/JPEG/BMP/GIF
  * codecs ship in the JDK — no external dependency): true
  * width/height, grayscale histograms, perceptual dHash fingerprints
  * ([[dHash64]]) and a real decode→scale→re-encode [[resizeImages]].
  * AUDIO decodes for real too for WAV/PCM (`javax.sound.sampled`,
  * also in the JDK): [[decodeWav]], exact sample stats
  * ([[audioStats]]), energy fingerprints and near-dedup. VIDEO ships
  * as a length-prefixed frame container whose frames are real PNGs —
  * per-frame decode, perceptual hashing and frame-voting near-dedup
  * ([[videoFrameHashes]]/[[videoNearDups]]) run the real image codec;
  * only the demuxer is synthetic. COMPRESSED codecs (mp3/aac,
  * h264/vp9) are NOT in the JDK, so those payloads keep the
  * deterministic [[decodeStub]] seam — on a real cluster the stub is
  * replaced by the FFI codec call and nothing else changes. Any payload the JDK cannot parse falls back to the
  * stub too, so mixed/corrupt corpora degrade per row, never fail
  * the job.
  *
  * Scale design: payload bytes never move through a shuffle — decode is
  * a narrow map over the scan partitions; only the (tiny) extracted
  * features flow downstream. `binaryFile` sources + partition sizing by
  * `spark.sql.files.maxPartitionBytes` keep one batch ≈ one task.
  * Near-duplicate detection over dHash rides the SAME pigeonhole
  * banding as text SimHash ([[graft.operators.Dedup.fingerprintNearDups]]):
  * O(n·chunks) shuffle rows, never an all-pairs join.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  /** Extracted features: fixed-size vector + summary stats. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  val FeatureDim = 16

  /** Spread the sampled doc_id driver rows across the cluster BEFORE
    * the expensive synthetic generation (render + encode + mux): the
    * ids come from one small parquet split (documents.parquet is a
    * single sub-128 MiB file at every local SF → ONE scan partition),
    * so without this the whole codec chain — thousands of times the
    * scan cost per row — serializes on one core while the rest idle
    * (r15: multimodal_video_avi spent its 3 s on a single task).
    * Deterministic hash on the id (never round-robin over rand):
    * retried tasks reproduce the same placement. Only 8-byte ids
    * shuffle; the payloads are BORN distributed — the "decide with
    * small rows, move big rows once" discipline, except here the big
    * rows never move at all.
    */
  private def spreadIds(ids: Dataset[Long]): Dataset[Long] = {
    val n = ids.sparkSession.sparkContext.defaultParallelism * 2
    ids.repartition(n, col(ids.columns.head))
  }

  /** STUB decode: a real implementation calls the image/audio codec on
    * the payload bytes (e.g. libjpeg/ffmpeg via FFI). The fake is
    * deterministic in the payload so tests are stable: a rolling
    * checksum and a byte-histogram-derived feature vector with the
    * exact shape/batching a codec-backed extractor would have.
    */
  private[sources] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 1125899906842597L
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      hist((payload(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    (checksum, hist.map(_ / n))
  }

  // ----- real JDK image codec ---------------------------------------

  /** Decode an image payload with the JDK's own codecs. None = not a
    * parseable image (wrong kind, corrupt bytes) — callers fall back
    * to the stub seam instead of failing the task.
    */
  private[graft] def decodeImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def encodePng(
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Integer luminance (0..255) of a pixel, ITU-R 601 weights. */
  @inline private def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** The perceptual difference hash (dHash, 64-bit): average the
    * luminance over a 9×8 grid of pixel blocks (area averaging — no
    * resampling-library dependence, deterministic on any platform),
    * then emit one bit per horizontal neighbor pair
    * (`cell[r][i+1] > cell[r][i]`). Robust to uniform re-scaling and
    * lossless re-encoding by construction; small local edits flip few
    * bits, which is what the banded hamming join thresholds on.
    */
  private[graft] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val cols = 9
    val rows = 8
    val w = img.getWidth
    val h = img.getHeight
    val grid = Array.ofDim[Double](rows, cols)
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        // pixel block [x0, x1) x [y0, y1) of cell (r, c)
        val x0 = (c.toLong * w / cols).toInt
        val x1 = math.max((((c + 1).toLong * w) / cols).toInt, x0 + 1)
        val y0 = (r.toLong * h / rows).toInt
        val y1 = math.max((((r + 1).toLong * h) / rows).toInt, y0 + 1)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            sum += luma(img.getRGB(x, y))
            x += 1
          }
          y += 1
        }
        val n = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
        grid(r)(c) = if (n <= 0) 0.0 else sum.toDouble / n
        c += 1
      }
      r += 1
    }
    var bits = 0L
    var i = 0
    r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        if (grid(r)(c + 1) > grid(r)(c)) bits |= 1L << i
        i += 1
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Perceptual fingerprints for image rows: one narrow
    * `mapPartitions` decode pass (payloads never shuffle) emitting
    * `(media_id, dhash, width, height)` — true decoded dimensions,
    * not metadata claims. Rows that fail to decode are dropped (they
    * have no perceptual content to match on).
    */
  def imageDHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImage(r.payload).map(img =>
          (r.media_id, dHash64(img), img.getWidth, img.getHeight))
      }
    }.toDF("media_id", "dhash", "width", "height")
  }

  /** Image near-duplicate pairs (hamming(dhash) ≤ `maxBits`) via the
    * shared pigeonhole banding — the visual twin of SimHash text
    * dedup: finds the same picture re-scaled, re-encoded, or lightly
    * edited without ever forming the O(n²) pair space.
    */
  def imageNearDups(media: Dataset[MediaRow], maxBits: Int = 3): DataFrame =
    graft.operators.Dedup.fingerprintNearDups(
      imageDHashes(media), "media_id", "dhash", maxBits)

  /** Persist the corpus's image fingerprints as an incremental
    * near-dup index; probe each ingest batch with [[dedupNewImages]]
    * in O(new) — the media face of the text pipeline's LSH index.
    */
  def writeImageIndex(media: Dataset[MediaRow], dir: String,
      maxBits: Int = 3): Unit =
    graft.operators.Dedup.writeFingerprintIndex(
      imageDHashes(media), "media_id", "dhash", dir, maxBits)

  /** Near-dups of a NEW media batch against the indexed corpus plus
    * within the batch; decode + fingerprint cost is O(new) only.
    * Call [[appendNewImages]] after accepting the batch so the index
    * stays current.
    */
  def dedupNewImages(media: Dataset[MediaRow], dir: String): DataFrame =
    graft.operators.Dedup.fingerprintDedupAgainstIndex(
      imageDHashes(media), "media_id", "dhash", dir)

  def appendNewImages(media: Dataset[MediaRow], dir: String): Unit =
    graft.operators.Dedup.appendFingerprintIndex(
      imageDHashes(media), "media_id", "dhash", dir)

  /** Batched decode + feature extraction: one `mapPartitions` pass, no
    * shuffle; the payload column is dropped from the output so only
    * features flow downstream. Image rows decode for REAL (JDK
    * codecs): checksum = rolling hash over the decoded luminance
    * plane, feature = normalized 16-bin luminance histogram. Audio/
    * video (and unparseable payloads) take the stub seam.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded = if (r.kind == "image") decodeImage(r.payload) else None
        val (checksum, feature) = decoded match {
          case Some(img) => imageStats(img)
          case None => decodeStub(r.payload)
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          checksum, feature)
      }
    }
  }

  /** Checksum + normalized luminance histogram over DECODED pixels. */
  private[graft] def imageStats(
      img: java.awt.image.BufferedImage): (Long, Array[Float]) = {
    var checksum = 1125899906842597L
    val hist = new Array[Float](FeatureDim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val l = luma(img.getRGB(x, y))
        checksum = checksum * 31 + l
        hist(l * FeatureDim / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.max(img.getWidth.toLong * img.getHeight, 1L).toFloat
    (checksum, hist.map(_ / n))
  }

  /** Deterministic synthetic media table (payloads derived from the
    * documents table's text bytes) for exercising the plumbing.
    */
  def syntheticMedia(spark: SparkSession, documentsDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(300)) + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index,
    * computed declaratively (the decode of each sampled frame is the
    * stubbed step).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("sampled_frames",
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
      .withColumn("n_sampled", size(col("sampled_frames")))

  /** The aspect-preserving target box every resize path uses. */
  private[graft] def fitBox(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(math.max(w, h), 1))
    (math.max((w * scale).toInt, 1), math.max((h * scale).toInt, 1))
  }

  /** REAL image resize: decode (JDK codecs), scale into the
    * aspect-preserving box with bilinear interpolation, re-encode as
    * PNG. Payloads `ImageIO` cannot parse fall back to the stub seam
    * (metadata-accurate truncation) so mixed corpora never fail.
    */
  private[sources] def resizeReal(payload: Array[Byte],
      maxSide: Int): Option[(Array[Byte], Int, Int)] =
    decodeImage(payload).map { img =>
      val (nw, nh) = fitBox(img.getWidth, img.getHeight, maxSide)
      val out = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      (encodePng(out), nw, nh)
    }

  /** STUB resize for non-decodable payloads: output metadata reflects
    * the target box with aspect ratio preserved, payload truncated
    * proportionally so byte-accounting stays deterministic.
    */
  private[sources] def resizeStub(payload: Array[Byte], w: Int, h: Int,
      maxSide: Int): (Array[Byte], Int, Int) = {
    val (nw, nh) = fitBox(w, h, maxSide)
    val keep = math.max(
      (payload.length * (nw.toLong * nh) / math.max(w.toLong * h, 1L)).toInt, 1)
    (java.util.Arrays.copyOf(payload, math.min(keep, payload.length)), nw, nh)
  }

  /** Batched resize for image rows: one `mapPartitions` pass, payloads
    * never shuffle; non-image rows pass through untouched; decodable
    * images take the real codec path, others the stub.
    */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map {
        case r if r.kind == "image" =>
          resizeReal(r.payload, maxSide) match {
            case Some((p, w, h)) => r.copy(payload = p, width = w, height = h)
            case None =>
              val (p, w, h) = resizeStub(r.payload, r.width, r.height, maxSide)
              r.copy(payload = p, width = w, height = h)
          }
        case r => r
      }
    }
  }

  // ----- deterministic synthetic images (real PNGs) ------------------

  /** Render the deterministic test image of `(group, docId)`: an 8-row
    * × 9-column grid of uniform luminance blocks whose HORIZONTAL
    * steps follow the 64 bits of md5(group) — so [[dHash64]] of the
    * decoded image IS those bits, for ANY member size (block
    * averaging recovers the exact cell values when the dimensions are
    * multiples of 9×8, which [[syntheticImages]] guarantees). Members
    * of one group render at different pixel sizes, making them true
    * scale-variant near-duplicates with identical fingerprints.
    */
  private[graft] def renderGridImage(group: Long, w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val bits = groupBits(group)
    val cols = 9
    val rows = 8
    // per-row walk: start 128, step ±12 per bit — range stays within
    // [32, 224], every step strict so the dHash sign is unambiguous
    val cells = Array.ofDim[Int](rows, cols)
    var r = 0
    while (r < rows) {
      cells(r)(0) = 128
      var c = 1
      while (c < cols) {
        val bit = (bits >>> (r * (cols - 1) + (c - 1))) & 1L
        cells(r)(c) = cells(r)(c - 1) + (if (bit == 1L) 12 else -12)
        c += 1
      }
      r += 1
    }
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, cells(y * rows / h)(x * cols / w))
        x += 1
      }
      y += 1
    }
    img
  }

  /** 64 deterministic bits per group (first 8 bytes of md5 of the
    * decimal string — the same digest every engine has).
    */
  private[graft] def groupBits(group: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(group.toString.getBytes("UTF-8"))
    var bits = 0L
    var i = 0
    while (i < 8) { bits = (bits << 8) | (d(i) & 0xffL); i += 1 }
    bits
  }

  /** A deterministic corpus of REAL PNG images keyed by the documents
    * table: each sampled `doc_id` joins perceptual group
    * `doc_id % nGroups` and renders that group's grid image at a
    * member-specific pixel size (multiples of 9×8 so fingerprints are
    * exact) — planted scale-variant near-duplicates whose expected
    * group structure is pure doc_id arithmetic, recomputable by any
    * SQL engine without decoding a single byte.
    */
  def syntheticImages(spark: SparkSession, documentsDir: String,
      sampleMod: Long = 41L, nGroups: Long = 97L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsDir)
      .select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(sampleMod)) === 0)
      .as[Long]
      .transform(spreadIds)
      .mapPartitions { ids =>
        ids.map { docId =>
          val g = ((docId % nGroups) + nGroups) % nGroups
          val w = 9 * (8 + (docId % 5L).toInt)
          val h = 8 * (8 + (docId % 3L).toInt)
          val png = encodePng(renderGridImage(g, w, h))
          MediaRow(docId, "image", png, w, h, 0, 1)
        }
      }
  }

  // ----- real JDK audio codec (WAV/PCM via javax.sound.sampled) -----

  /** Decoded mono PCM audio: sample rate + first-channel samples. */
  final case class WavData(sampleRate: Int, samples: Array[Int])

  /** Decode a WAV payload with the JDK's own parser
    * (`javax.sound.sampled` ships WAV/AIFF/AU PCM support — no
    * external dependency). None = not parseable audio (compressed
    * codecs like mp3/aac are NOT in the JDK and keep the stub seam).
    * Multi-channel input keeps channel 0; 8/16-bit signed PCM.
    */
  private[graft] def decodeWav(payload: Array[Byte]): Option[WavData] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        if (f.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val bytesPerSample = f.getSampleSizeInBits / 8
        if (bytesPerSample != 1 && bytesPerSample != 2) return None
        val frameSize = f.getFrameSize
        val raw = in.readAllBytes()
        val nFrames = raw.length / frameSize
        val out = new Array[Int](nFrames)
        var i = 0
        while (i < nFrames) {
          val base = i * frameSize
          out(i) =
            if (bytesPerSample == 1) raw(base).toInt
            else if (f.isBigEndian)
              (raw(base) << 8) | (raw(base + 1) & 0xff)
            else (raw(base + 1) << 8) | (raw(base) & 0xff)
          i += 1
        }
        Some(WavData(f.getSampleRate.toInt, out))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Encode 16-bit mono PCM as a WAV container (JDK writer). */
  private[graft] def encodeWav(samples: Array[Int],
      sampleRate: Int): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Exact integer stats over DECODED samples — the audit numbers a
    * corpus pipeline filters on (silence, clipping, length), all
    * derivable in plain SQL for the synthetic corpus.
    */
  final case class AudioStats(media_id: Long, n_samples: Long,
      sample_rate: Int, duration_us: Long, sum_sq: Long,
      zero_crossings: Long, peak: Int)

  def audioStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.payload).map { w =>
          var sumSq = 0L
          var zc = 0L
          var peak = 0
          var i = 0
          val s = w.samples
          while (i < s.length) {
            val v = s(i)
            sumSq += v.toLong * v
            if (i > 0 && ((s(i - 1) < 0 && v >= 0) ||
                (s(i - 1) >= 0 && v < 0))) zc += 1
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          AudioStats(r.media_id, s.length.toLong, w.sampleRate,
            s.length.toLong * 1000000L / w.sampleRate, sumSq, zc, peak)
        }
      }
    }.toDF()
  }

  /** 64-bit audio fingerprint: split the clip into 64 equal time
    * chunks, bit = chunk energy above the clip's mean chunk energy —
    * invariant to uniform amplitude scaling (both sides scale by the
    * same factor), so a re-mastered copy of the same material matches
    * under the shared banded hamming join
    * ([[graft.operators.Dedup.fingerprintNearDups]]).
    */
  private[graft] def audioFingerprint(samples: Array[Int]): Long = {
    if (samples.length < 64) return 0L
    val chunk = samples.length / 64
    val energy = new Array[Double](64)
    var c = 0
    while (c < 64) {
      var e = 0.0
      var i = c * chunk
      val end = i + chunk
      while (i < end) { e += samples(i).toDouble * samples(i); i += 1 }
      energy(c) = e
      c += 1
    }
    val mean = energy.sum / 64
    var bits = 0L
    c = 0
    while (c < 64) {
      if (energy(c) > mean) bits |= 1L << c
      c += 1
    }
    bits
  }

  /** Audio near-duplicate pairs over the energy fingerprint. */
  def audioNearDups(media: Dataset[MediaRow], maxBits: Int = 3): DataFrame = {
    import media.sparkSession.implicits._
    val fps = media.filter(_.kind == "audio").mapPartitions { rows =>
      // clips shorter than the 64-chunk grid have no energy profile to
      // fingerprint — drop them like undecodable payloads (a shared 0L
      // would make every tiny clip a mutual "duplicate")
      rows.flatMap(r => decodeWav(r.payload)
        .filter(_.samples.length >= 64)
        .map(w => (r.media_id, audioFingerprint(w.samples))))
    }.toDF("media_id", "afp")
    graft.operators.Dedup.fingerprintNearDups(fps, "media_id", "afp",
      maxBits)
  }

  /** Deterministic REAL WAV corpus keyed by the documents table: each
    * sampled doc renders an 8 kHz 16-bit mono square wave whose
    * period, length and amplitude are doc_id arithmetic —
    *   P = 20 + (doc_id % 5)·20   (even, samples per period)
    *   N = P · (40 + doc_id % 7)  (whole periods)
    *   A = 1000 + (doc_id % 10)·500
    * so the DECODED stats are closed-form: n_samples = N,
    * sum_sq = N·A², zero_crossings = 2·(N/P) − 1, peak = A — an SQL
    * oracle for a real audio codec without synthesizing a sine table.
    */
  def syntheticWavs(spark: SparkSession, documentsDir: String,
      sampleMod: Long = 41L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsDir)
      .select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(sampleMod)) === 0)
      .as[Long]
      .transform(spreadIds)
      .mapPartitions { ids =>
        ids.map { docId =>
          val p = 20 + (docId % 5L).toInt * 20
          val n = p * (40 + (docId % 7L).toInt)
          val a = 1000 + (docId % 10L).toInt * 500
          val samples = Array.tabulate(n)(i =>
            if (i % p < p / 2) a else -a)
          MediaRow(docId, "audio", encodeWav(samples, 8000),
            0, 0, 8000, 1)
        }
      }
  }

  // ----- frame-level video plumbing (real per-frame image decode) ---

  /** Minimal deterministic frame container ("GFV1"): magic, frame
    * count, then length-prefixed PNG frames. A real video codec
    * (h264/vp9) is not in the JDK — the CONTAINER is synthetic, but
    * every frame inside is a real PNG decoded with the real JDK
    * codec, so the per-frame pipeline (decode → fingerprint → vote)
    * exercises exactly what an FFI-codec build would run after
    * demuxing.
    */
  private[graft] def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(0x47465631) // "GFV1"
    d.writeInt(frames.size)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    d.flush()
    out.toByteArray
  }

  /** Per-frame bytes from a video payload: RIFF/AVI containers (MJPG
    * or uncompressed DIB streams — [[Avi.demux]], the real public
    * format) and the legacy length-prefixed list both demux; anything
    * else drops (None).
    */
  private[graft] def decodeFrames(
      payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    decodeFramesGfv(payload).orElse(Avi.demux(payload))

  private def decodeFramesGfv(
      payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (d.readInt() != 0x47465631) return None
      val n = d.readInt()
      if (n < 0 || n > 1000000) return None
      Some((0 until n).map { _ =>
        val len = d.readInt()
        val buf = new Array[Byte](len)
        d.readFully(buf)
        buf
      })
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame perceptual hashes for video rows: one narrow decode
    * pass emitting `(media_id, frame_idx, dhash)` for every
    * `stride`-th frame — payloads never shuffle, only 16-byte hash
    * rows flow downstream. Undecodable containers/frames drop.
    */
  def videoFrameHashes(media: Dataset[MediaRow],
      stride: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        decodeFrames(r.payload).toSeq.flatMap { frames =>
          frames.indices.by(stride).flatMap { i =>
            decodeImage(frames(i)).map(img =>
              (r.media_id, i, dHash64(img)))
          }
        }
      }
    }.toDF("media_id", "frame_idx", "dhash")
  }

  /** Video near-duplicates by FRAME VOTING: two videos match when
    * they share ≥ `minSharedFrames` distinct frame fingerprints —
    * robust to temporal clipping (a shared tail still votes) and, via
    * dHash, to per-frame re-scaling. The pair space is generated by
    * the frame-hash equi-join (hot hashes = real shared content =
    * real output), never an all-pairs comparison; the voting groupBy
    * partial-aggregates map-side.
    */
  def videoNearDups(media: Dataset[MediaRow], minSharedFrames: Int = 3,
      stride: Int = 1): DataFrame = {
    // lazy-persist contract (see graft.operators.Dedup's header): the
    // result is lazy, so the frame hashes can't unpersist here without
    // recomputing the decode for both join sides — blocks release via
    // Spark's LRU (MEMORY_AND_DISK evicts under pressure), and repeat
    // callers reuse the entry instead of re-decoding every frame
    val fh = videoFrameHashes(media, stride)
      .select(col("media_id"), col("dhash")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = fh.select(col("media_id").as("id_a"), col("dhash"))
    val b = fh.select(col("media_id").as("id_b"), col("dhash"))
    a.join(b, Seq("dhash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_frames"))
      .filter(col("n_shared_frames") >= minSharedFrames)
  }

  /** Deterministic REAL-frame video corpus keyed by the documents
    * table: group `doc_id % nGroups` plays the same 12-frame sequence
    * (frame i renders grid image `groupBits(g·1000 + i)`), each
    * member at its own pixel size AND with the first `doc_id % 3`
    * frames clipped — scale-variant, temporally-offset duplicates
    * whose expected frame overlap (`12 − max(clipA, clipB)`) is pure
    * doc_id arithmetic.
    */
  def syntheticVideos(spark: SparkSession, documentsDir: String,
      sampleMod: Long = 41L, nGroups: Long = 97L,
      nFrames: Int = 12): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsDir)
      .select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(sampleMod)) === 0)
      .as[Long]
      .transform(spreadIds)
      .mapPartitions { ids =>
        ids.map { docId =>
          val g = ((docId % nGroups) + nGroups) % nGroups
          val clip = (docId % 3L).toInt
          val w = 9 * (8 + (docId % 5L).toInt)
          val h = 8 * (8 + (docId % 3L).toInt)
          val frames = (clip until nFrames).map(i =>
            encodePng(renderGridImage(g * 1000L + i, w, h)))
          MediaRow(docId, "video", encodeFrames(frames),
            w, h, 0, frames.size)
        }
      }
  }

  /** [[syntheticVideos]] with REAL RIFF/AVI containers: the same
    * deterministic frame sequences muxed as uncompressed-DIB AVI
    * streams ([[Avi.mux]]), so the engine side demuxes a genuine
    * public container format before the per-frame decode →
    * fingerprint → vote pipeline runs. DIB (lossless) keeps the
    * frame fingerprints bit-deterministic across the container
    * round-trip — the oracle's doc_id arithmetic stays exact.
    */
  def syntheticVideosAvi(spark: SparkSession, documentsDir: String,
      sampleMod: Long = 41L, nGroups: Long = 97L,
      nFrames: Int = 12): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsDir)
      .select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(sampleMod)) === 0)
      .as[Long]
      .transform(spreadIds)
      .mapPartitions { ids =>
        ids.map { docId =>
          val g = ((docId % nGroups) + nGroups) % nGroups
          val clip = (docId % 3L).toInt
          val w = 9 * (8 + (docId % 5L).toInt)
          val h = 8 * (8 + (docId % 3L).toInt)
          val frames = (clip until nFrames).map(i =>
            renderGridImage(g * 1000L + i, w, h))
          MediaRow(docId, "video", Avi.mux(frames, "DIB "),
            w, h, 0, frames.size)
        }
      }
  }
}
