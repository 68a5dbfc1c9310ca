package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The real compressed-media codecs: IMA ADPCM (lossy, quality- and
  * layout-gated) and the inter-frame delta video codec (lossless by
  * construction — temporal prediction + zigzag varint RLE only). */
class MediaCodecsSpec extends AnyFunSuite {

  private def sine(n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (8000 * math.sin(2 * math.Pi * i / 64.0)).toShort)

  test("ADPCM round-trip: exact length, exact first sample, " +
      "deterministic, ~4:1 size") {
    for (n <- Seq(1, 2, 63, 64, 1001)) {
      val s = sine(n)
      val enc = AdpcmCodec.encode(s)
      assert(enc.length == 4 + n / 2, s"n=$n") // (n-1 codes + pad)/2
      val dec = AdpcmCodec.decode(enc)
      assert(dec.length == n, s"n=$n: decoded ${dec.length}")
      assert(dec(0) == s(0), "predictor header = sample 0 exactly")
      assert(AdpcmCodec.decode(AdpcmCodec.encode(s)).toSeq == dec.toSeq)
    }
  }

  test("ADPCM tracks a smooth signal: SNR >= 25 dB on a sine") {
    val s = sine(4096)
    val dec = AdpcmCodec.decode(AdpcmCodec.encode(s))
    var sig = 0.0; var err = 0.0
    for (i <- s.indices) {
      sig += s(i).toDouble * s(i)
      val e = dec(i) - s(i).toDouble
      err += e * e
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr >= 25.0, s"SNR $snr dB")
  }

  test("ADPCM on the driver fixture's triangle wave: mean abs " +
      "error within the q_audio_adpcm gate") {
    for (k <- 0L until 8L) {
      val n = 1000
      val orig = Array.tabulate(n)(i =>
        (math.abs(((k * 37 + i * 19) % 2000) - 1000) - 500).toShort)
      val dec = AdpcmCodec.decode(graft.synth.Synth.adpcmTrack(k, n))
      assert(dec.length == n)
      val mae = orig.indices.map(i =>
        math.abs(dec(i) - orig(i).toInt)).sum.toDouble / n
      assert(mae <= 16.0, s"track $k: mae=$mae")
    }
  }

  test("delta video round-trip is LOSSLESS and the stream is " +
      "smaller than raw") {
    val w = 16; val h = 12; val nf = 9
    val frames = (0 until nf).map { j =>
      Array.tabulate(w * h) { i =>
        val r = i / w; val c = i % w
        ((j * 17 + r * 7 + c * 3) % 251)
      }
    }
    val enc = DeltaVideoCodec.encode(frames, w, h)
    val (dw, dh, dec) = DeltaVideoCodec.decode(enc)
    assert((dw, dh) == (w, h) && dec.length == nf)
    for (j <- 0 until nf)
      assert(dec(j).toSeq == frames(j).toSeq, s"frame $j differs")
    val raw = 10 + nf * w * h * 2
    assert(enc.length < raw / 2,
      s"inter-frame coding should beat raw: ${enc.length} vs $raw")
  }

  test("delta video handles extreme deltas and rejects bad magic") {
    val frames = Seq(Array(0, 65535, 0, 65535), Array(65535, 0, 65535, 0))
    val (_, _, dec) =
      DeltaVideoCodec.decode(DeltaVideoCodec.encode(frames, 2, 2))
    assert(dec(1).toSeq == frames(1).toSeq)
    val bad = "NOPE".getBytes ++ new Array[Byte](20)
    intercept[IllegalArgumentException](DeltaVideoCodec.decode(bad))
  }
}
