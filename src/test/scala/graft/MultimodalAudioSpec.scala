package graft

import graft.multimodal.Multimodal

/** Real audio decode through javax.sound.sampled: the WAV container
  * round-trips (real encoder, real parser), the decoded samples
  * recover the planted tone parameters EXACTLY (frequency mod-29,
  * amplitude mod-7) despite phase variation and 16-bit quantization,
  * and the phase offsets make equal-fingerprint payloads
  * byte-distinct — the property that makes the fingerprint join a
  * real decode test, not a byte compare.
  */
class MultimodalAudioSpec extends SparkSpec {

  test("WAV round-trip recovers planted tone parameters exactly") {
    (0L until 100L).foreach { id =>
      val f = Multimodal.audioFeatures(id, Multimodal.synthWav(id))
      assert(f.sample_rate === 8000)
      assert(f.n_samples === 2000L)
      assert(f.dom_freq_hz === 400 + (id % 29).toInt * 100,
        s"doc $id: dominant frequency must be the planted tone")
      assert(f.amp_bucket === (id % 7).toInt,
        s"doc $id: amplitude bucket must survive 16-bit quantization")
    }
  }

  test("payload is a real WAV container; equal fingerprints differ in bytes") {
    val w0 = Multimodal.synthWav(0L)
    assert(new String(w0.take(4), "US-ASCII") === "RIFF")
    assert(new String(w0.slice(8, 12), "US-ASCII") === "WAVE")
    // ids 0 and 203 share (mod 29, mod 7) — same fingerprint — but
    // differ mod 13, so the phase makes the payloads distinct
    val w203 = Multimodal.synthWav(203L)
    assert(!java.util.Arrays.equals(w0, w203),
      "equal-fingerprint payloads must still be byte-distinct (phase)")
    val f0 = Multimodal.audioFeatures(0L, w0)
    val f203 = Multimodal.audioFeatures(203L, w203)
    assert(f0.dom_freq_hz === f203.dom_freq_hz && f0.amp_bucket === f203.amp_bucket)
  }

  test("fingerprint pairs over a small corpus match the modular arithmetic") {
    import spark.implicits._
    val feats = (0L until 250L).map(id =>
      Multimodal.audioFeatures(id, Multimodal.synthWav(id)))
    val pairs = for {
      a <- feats; b <- feats
      if a.doc_id < b.doc_id &&
        a.dom_freq_hz == b.dom_freq_hz && a.amp_bucket == b.amp_bucket
    } yield (a.doc_id, b.doc_id)
    val expected = for {
      a <- 0L until 250L; b <- 0L until 250L
      if a < b && a % 29 == b % 29 && a % 7 == b % 7
    } yield (a, b)
    assert(pairs.sorted === expected.sorted)
  }
}
