package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal.MediaRow

/** Real JDK WAV/PCM audio pipeline: container round-trip, exact
  * decoded stats, amplitude-invariant energy fingerprints, and the
  * shared banded near-dedup.
  */
class MultimodalAudioSpec extends SparkSpec {

  import spark.implicits._

  private def square(p: Int, periods: Int, a: Int): Array[Int] =
    Array.tabulate(p * periods)(i => if (i % p < p / 2) a else -a)

  test("WAV encode/decode round-trips samples and rate exactly") {
    val s = square(40, 10, 2000)
    val wav = Multimodal.encodeWav(s, 8000)
    val back = Multimodal.decodeWav(wav).get
    assert(back.sampleRate == 8000)
    assert(back.samples.toSeq == s.toSeq)
    // negative values survive the 16-bit little-endian round trip
    assert(back.samples.min == -2000 && back.samples.max == 2000)
    assert(Multimodal.decodeWav("not audio".getBytes).isEmpty)
  }

  test("audioStats matches the closed forms on a decoded square wave") {
    val p = 20; val m = 42; val a = 1500
    val row = MediaRow(1L, "audio",
      Multimodal.encodeWav(square(p, m, a), 8000), 0, 0, 8000, 1)
    val st = Multimodal.audioStats(Seq(row).toDS()).collect().head
    assert(st.getLong(1) == p.toLong * m)                 // n_samples
    assert(st.getInt(2) == 8000)                          // sample_rate
    assert(st.getLong(3) == p.toLong * m * 125)           // duration_us
    assert(st.getLong(4) == p.toLong * m * a.toLong * a)  // sum_sq
    assert(st.getLong(5) == 2L * m - 1)                   // zero_crossings
    assert(st.getInt(6) == a)                             // peak
  }

  test("energy fingerprint is amplitude-invariant; near-dedup finds the pair") {
    // same material, re-mastered louder: energies scale uniformly,
    // the above-mean bit pattern is identical
    val base = Array.tabulate(6400)(i =>
      if ((i / 100) % 3 == 0) 2000 else 100) // blocky energy profile
    val loud = base.map(_ * 2)
    val other = Array.tabulate(6400)(i =>
      if ((i / 100) % 3 == 1) 2000 else 100) // shifted profile
    assert(Multimodal.audioFingerprint(base) ==
      Multimodal.audioFingerprint(loud))
    assert(Multimodal.audioFingerprint(base) !=
      Multimodal.audioFingerprint(other))

    val rows = Seq(
      MediaRow(1L, "audio", Multimodal.encodeWav(base, 8000), 0, 0, 8000, 1),
      MediaRow(2L, "audio", Multimodal.encodeWav(loud, 8000), 0, 0, 8000, 1),
      MediaRow(3L, "audio", Multimodal.encodeWav(other, 8000), 0, 0, 8000, 1))
    val near = Multimodal.audioNearDups(rows.toDS(), maxBits = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(near == Set((1L, 2L)), s"got $near")
  }

  test("syntheticWavs renders decodable WAVs with formula stats") {
    val sample = Multimodal.syntheticWavs(spark,
      "/root/testdata/sf0.001/documents.parquet").collect()
    assert(sample.nonEmpty)
    sample.take(3).foreach { r =>
      val w = Multimodal.decodeWav(r.payload).get
      val p = 20 + (r.media_id % 5).toInt * 20
      val m = 40 + (r.media_id % 7).toInt
      assert(w.samples.length == p * m)
      assert(w.sampleRate == 8000)
    }
  }
}
