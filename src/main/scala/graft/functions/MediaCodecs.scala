package graft.functions

/** REAL compressed-media codecs, pure Scala — closing the "compressed
  * audio / inter-frame video are stubs" gap for this container (no
  * native media libs offline). Both are genuine codecs with published
  * algorithms, not fakes: the audio path is IMA/DVI ADPCM exactly as
  * specified in the IMA Digital Audio Focus/Technical Working Group
  * recommendation (the codec inside WAV format 0x0011), and the video
  * path is a temporal-prediction codec (keyframe + P-frames of
  * zigzag/varint run-length-coded pixel deltas — the structural core
  * of inter-frame compression, minus motion search).
  *
  * Spark shape: one clip/video per row as an opaque binary column;
  * decode state is confined to the row's own evaluation (sequential
  * WITHIN a stream, embarrassingly parallel ACROSS streams) — the
  * same decode contract the PNG tile path uses, so a 100 TB media
  * table partitions and scales identically.
  */
object AdpcmCodec {

  /** IMA ADPCM step-size table (89 entries) and index-adjustment
    * table — the published constants. */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)

  val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Block layout (one clip = one block):
    * predictor int16 LE (= sample 0, exact), reserved uint8 (0 —
    * both ends start at step index 0),
    * pad uint8 (1 = the final nibble is padding, not a sample);
    * then 4-bit codes packed LOW nibble first.
    * Decoded length is therefore exactly
    * `(bytes.length - 4) * 2 + 1 - pad` — an arithmetic fact an
    * external SQL engine can assert without decoding. */
  def encode(samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty, "cannot encode an empty clip")
    val nCodes = samples.length - 1
    val out = new Array[Byte](4 + (nCodes + 1) / 2)
    var pred: Int = samples(0)
    var index = 0
    out(0) = (pred & 0xff).toByte
    out(1) = ((pred >> 8) & 0xff).toByte
    out(3) = (nCodes & 1).toByte // odd code count ⇒ high pad nibble
    var i = 0
    while (i < nCodes) {
      val step = StepTable(index)
      val diff = samples(i + 1) - pred
      var delta = if (diff < 0) -diff else diff
      var code = if (diff < 0) 8 else 0
      var diffq = step >> 3
      if (delta >= step) { code |= 4; delta -= step; diffq += step }
      if (delta >= (step >> 1)) {
        code |= 2; delta -= step >> 1; diffq += step >> 1
      }
      if (delta >= (step >> 2)) { code |= 1; diffq += step >> 2 }
      pred = if ((code & 8) != 0) pred - diffq else pred + diffq
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      index += IndexTable(code)
      if (index < 0) index = 0 else if (index > 88) index = 88
      val b = 4 + (i >> 1)
      if ((i & 1) == 0) out(b) = (code & 0x0f).toByte
      else out(b) = (out(b) | (code << 4)).toByte
      i += 1
    }
    out
  }

  /** Decode an [[encode]]-layout IMA ADPCM block back to PCM16. The
    * quantizer state machine is the published IMA decoder: diffq =
    * step/8 + bit2·step + bit1·step/2 + bit0·step/4, predictor
    * clamped to int16, index stepped by [[IndexTable]]. */
  def decode(bytes: Array[Byte]): Array[Short] = {
    require(bytes.length >= 4, s"ADPCM block too short: ${bytes.length}")
    val pad = bytes(3) & 1
    val nCodes = (bytes.length - 4) * 2 - pad
    require(nCodes >= 0,
      "malformed ADPCM block: pad bit set with no code bytes")
    val out = new Array[Short](nCodes + 1)
    var pred: Int = ((bytes(1) << 8) | (bytes(0) & 0xff)).toShort.toInt
    var index = 0
    out(0) = pred.toShort
    var i = 0
    while (i < nCodes) {
      val b = bytes(4 + (i >> 1)) & 0xff
      val code = if ((i & 1) == 0) b & 0x0f else (b >> 4) & 0x0f
      val step = StepTable(index)
      var diffq = step >> 3
      if ((code & 4) != 0) diffq += step
      if ((code & 2) != 0) diffq += step >> 1
      if ((code & 1) != 0) diffq += step >> 2
      pred = if ((code & 8) != 0) pred - diffq else pred + diffq
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      index += IndexTable(code)
      if (index < 0) index = 0 else if (index > 88) index = 88
      out(i + 1) = pred.toShort
      i += 1
    }
    out
  }
}

/** Inter-frame (temporal-prediction) video codec: a keyframe of raw
  * uint16 BE pixels followed by P-frames holding only the per-pixel
  * CHANGE from the previous frame, zigzag-mapped to unsigned,
  * LEB128-varint coded, and run-length collapsed — so a frame that
  * barely changes costs a handful of bytes whatever its resolution.
  * Decoding frame j requires frame j-1 (true inter-frame dependency);
  * the dependency chain lives INSIDE one row's binary value, so the
  * operator still maps freely over a distributed video table.
  *
  * Layout: "GDV1" magic, w uint16 BE, h uint16 BE, nFrames uint16 BE;
  * keyframe = w·h uint16 BE; each P-frame = (runLen varint,
  * zigzag(delta) varint)* until w·h pixels are covered.
  */
object DeltaVideoCodec {
  val Magic: Array[Byte] = "GDV1".getBytes("US-ASCII")

  private def zigzag(v: Int): Int = (v << 1) ^ (v >> 31)
  private def unzigzag(u: Int): Int = (u >>> 1) ^ -(u & 1)

  private def putVarint(out: java.io.ByteArrayOutputStream,
      v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
  }

  /** Encode frames (each w·h values in [0, 65535]) — frame 0 intra,
    * the rest temporal deltas. */
  def encode(frames: Seq[Array[Int]], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      s"every frame must be ${w}x$h")
    require(w <= 0xffff && h <= 0xffff && frames.length <= 0xffff,
      s"header fields are uint16: w=$w h=$h nFrames=${frames.length}")
    require(frames.forall(_.forall(v => v >= 0 && v <= 0xffff)),
      "pixels must be uint16 — a silently truncated keyframe would " +
        "corrupt every temporally-predicted frame after it")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    out.write(w >> 8); out.write(w & 0xff)
    out.write(h >> 8); out.write(h & 0xff)
    out.write(frames.length >> 8); out.write(frames.length & 0xff)
    val key = frames.head
    var i = 0
    while (i < key.length) {
      out.write(key(i) >> 8); out.write(key(i) & 0xff); i += 1
    }
    var j = 1
    while (j < frames.length) {
      val prev = frames(j - 1); val cur = frames(j)
      var p = 0
      while (p < cur.length) {
        val d = cur(p) - prev(p)
        var run = 1
        while (p + run < cur.length &&
          cur(p + run) - prev(p + run) == d) run += 1
        putVarint(out, run)
        putVarint(out, zigzag(d))
        p += run
      }
      j += 1
    }
    out.toByteArray
  }

  /** Decode every frame; the returned arrays are the exact input
    * frames (the codec is lossless — delta + varint + RLE only). */
  def decode(bytes: Array[Byte]): (Int, Int, IndexedSeq[Array[Int]]) = {
    require(bytes.length >= 10 && bytes(0) == Magic(0) &&
      bytes(1) == Magic(1) && bytes(2) == Magic(2) && bytes(3) == Magic(3),
      "not a GDV1 stream")
    def u16(o: Int) = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    val w = u16(4); val h = u16(6); val nFrames = u16(8)
    val n = w * h
    var pos = 10
    val key = new Array[Int](n)
    var i = 0
    while (i < n) { key(i) = u16(pos); pos += 2; i += 1 }
    def varint(): Int = {
      var v = 0; var shift = 0; var more = true
      while (more) {
        val b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7f) << shift; shift += 7; more = (b & 0x80) != 0
      }
      v
    }
    val frames = scala.collection.mutable.ArrayBuffer[Array[Int]](key)
    var j = 1
    while (j < nFrames) {
      val prev = frames(j - 1)
      val cur = new Array[Int](n)
      var p = 0
      while (p < n) {
        val run = varint()
        val d = unzigzag(varint())
        require(run >= 1 && p + run <= n, s"corrupt run at frame $j")
        var r = 0
        while (r < run) { cur(p + r) = prev(p + r) + d; r += 1 }
        p += run
      }
      frames += cur
      j += 1
    }
    (w, h, frames.toIndexedSeq)
  }
}
