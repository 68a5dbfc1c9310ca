package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Tile pixel codecs for the `(bytes, fmt, w, h)` columns of the tile
  * table (BASELINE.json input_hint). Pixel model: single-band float32,
  * row-major — the Spark analogue of the reference's per-band
  * `ReadAsArray` blocks (`/root/reference/runner.py:634-635`).
  *
  * Formats:
  *   - `raw`  : float32 little-endian, byte-exact.
  *   - `png`  : 16-bit grayscale PNG storing `round(v) + PngOffset`;
  *              lossless for integer-valued pixels in
  *              [-PngOffset, 65535-PngOffset] (covers the -9999 nodata).
  *   - `jpg`  : 8-bit grayscale JPEG, values expected in [0, 255];
  *              lossy — gated by PSNR >= 40 dB in tests per input_hint.
  */
object ImageCodec {
  val PngOffset = 10000

  // javax.imageio serializes hard under concurrency unless tamed:
  // ImageIO.read's default ImageInputStream is DISK-cached (temp-file
  // creation under a global lock per decode!) and reader lookup walks
  // the IIORegistry. Thread-local readers + memory-cached streams keep
  // the decode path lock-free across executor threads.
  ImageIO.setUseCache(false)

  private val pngReader = ThreadLocal.withInitial[javax.imageio.ImageReader](
    () => ImageIO.getImageReadersByFormatName("png").next())
  private val jpgReader = ThreadLocal.withInitial[javax.imageio.ImageReader](
    () => ImageIO.getImageReadersByFormatName("jpg").next())

  private val scratch = ThreadLocal.withInitial[Array[Byte]](
    () => Array.emptyByteArray)
  private val inflater = ThreadLocal.withInitial[java.util.zip.Inflater](
    () => new java.util.zip.Inflater())

  private def readVia(tl: ThreadLocal[javax.imageio.ImageReader],
      bytes: Array[Byte]): BufferedImage = {
    val reader = tl.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally {
      reader.setInput(null)
      iis.close()
    }
  }

  def encodeRaw(px: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(px.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.asFloatBuffer().put(px)
    bb.array()
  }

  /** True on x86/ARM LE hosts: a little-endian payload can be moved
    * into a primitive array with ONE `Platform.copyMemory` (real
    * memcpy) instead of an element-wise `FloatBuffer.get` loop —
    * measured 36 → ~6 µs per 64 KB tile. Big-endian hosts keep the
    * portable buffer path. */
  private val nativeLE =
    ByteOrder.nativeOrder() == ByteOrder.LITTLE_ENDIAN

  def decodeRaw(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length / 4
    val out = new Array[Float](n)
    if (nativeLE) {
      org.apache.spark.unsafe.Platform.copyMemory(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, out,
        org.apache.spark.unsafe.Platform.FLOAT_ARRAY_OFFSET, n * 4L)
    } else {
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        .asFloatBuffer().get(out)
    }
    out
  }

  def encodePng(px: Array[Float], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < px.length) {
      val v = Math.round(px(i)) + PngOffset
      raster.setSample(i % w, i / w, 0, math.max(0, math.min(65535, v)))
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodePng(bytes: Array[Byte]): Array[Float] = {
    // fast path: our own decoder for the gray16 non-interlaced subset
    // this codec writes — zlib inflate + PNG unfilter, no BufferedImage
    // allocation, no ImageIO locks; scales linearly across executor
    // threads. Anything else falls back to ImageIO.
    val fast = decodePngGray16(bytes)
    if (fast != null) return fast
    val img = readVia(pngReader, bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val out = new Array[Float](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = (raster.getSample(i % w, i / w, 0) - PngOffset).toFloat
      i += 1
    }
    out
  }

  /** Minimal PNG decoder for 16-bit grayscale, non-interlaced images
    * (PNG spec: IHDR/IDAT/IEND chunks, zlib stream, per-row filter
    * byte, filters 0-4, big-endian samples). Returns null when the
    * image is outside this subset. */
  def decodePngGray16(bytes: Array[Byte]): Array[Float] =
    decodePngGray16Impl(bytes, reuseOut = false)

  private val IHDR = 0x49484452
  private val IDAT = 0x49444154
  private val IEND = 0x49454e44

  /** @param reuseOut true → the pixel output is a REUSED thread-local
    *   buffer (possibly longer than w·h), valid only until the next
    *   reuse-mode decode on this thread. The per-tile hot loop then
    *   allocates NOTHING — at 32 executor threads the kernel's
    *   allocation rate drops from ~70 KB/tile to ~0, which is the
    *   difference between ParallelGC keeping up and not. */
  private def decodePngGray16Impl(bytes: Array[Byte],
      reuseOut: Boolean): Array[Float] = {
    if (bytes.length < 33 || bytes(0) != 0x89.toByte || bytes(1) != 'P')
      return null
    val pos = 8
    var w = 0; var h = 0
    var ok = false
    // first pass: read IHDR (chunk types compared as ints — no String
    // per chunk in the hot loop)
    var p = pos
    while (p + 8 <= bytes.length) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      val typ = ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
        ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
      if (typ == IHDR) {
        w = ((bytes(p + 8) & 0xff) << 24) | ((bytes(p + 9) & 0xff) << 16) |
          ((bytes(p + 10) & 0xff) << 8) | (bytes(p + 11) & 0xff)
        h = ((bytes(p + 12) & 0xff) << 24) | ((bytes(p + 13) & 0xff) << 16) |
          ((bytes(p + 14) & 0xff) << 8) | (bytes(p + 15) & 0xff)
        val bitDepth = bytes(p + 16) & 0xff
        val colorType = bytes(p + 17) & 0xff
        val interlace = bytes(p + 20) & 0xff
        ok = bitDepth == 16 && colorType == 0 && interlace == 0
        if (!ok) return null
        p = bytes.length // IHDR is first; nothing else needed this pass
      }
      p += 12 + len
    }
    if (!ok || w <= 0 || h <= 0) return null

    val rowBytes = w * 2
    // thread-local scratch: tiles in a table are uniform-sized, so the
    // filtered-scanline buffer and Inflater are reused per executor
    // thread. IDAT payloads stream straight into the inflater chunk by
    // chunk — no concatenation copy.
    val need = (rowBytes + 1) * h
    var raw = scratch.get()
    if (raw.length < need) { raw = new Array[Byte](need); scratch.set(raw) }
    val inf = inflater.get()
    inf.reset()
    var off = 0
    p = pos
    while (p + 8 <= bytes.length && off < need) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      val typ = ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
        ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
      if (typ == IDAT) {
        inf.setInput(bytes, p + 8, len)
        var more = true
        while (more && off < need && !inf.finished()) {
          val n = inf.inflate(raw, off, need - off)
          off += n
          if (n == 0 && inf.needsInput()) more = false
        }
      } else if (typ == IEND) p = bytes.length
      p += 12 + len
    }
    if (off != need) return null

    // unfilter in place (bpp = 2)
    val out = if (reuseOut) tlFloatBuf(w * h) else new Array[Float](w * h)
    var ri = 0
    var row = 0
    while (row < h) {
      val filt = raw(ri) & 0xff
      val base = ri + 1
      val prev = base - (rowBytes + 1)
      filt match {
        case 0 =>
        case 1 => // Sub
          var i = 2
          while (i < rowBytes) {
            raw(base + i) = (raw(base + i) + raw(base + i - 2)).toByte; i += 1
          }
        case 2 => // Up
          if (row > 0) {
            var i = 0
            while (i < rowBytes) {
              raw(base + i) = (raw(base + i) + raw(prev + i)).toByte; i += 1
            }
          }
        case 3 => // Average
          var i = 0
          while (i < rowBytes) {
            val a = if (i >= 2) raw(base + i - 2) & 0xff else 0
            val b = if (row > 0) raw(prev + i) & 0xff else 0
            raw(base + i) = (raw(base + i) + ((a + b) >> 1)).toByte; i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < rowBytes) {
            val a = if (i >= 2) raw(base + i - 2) & 0xff else 0
            val b = if (row > 0) raw(prev + i) & 0xff else 0
            val cc = if (i >= 2 && row > 0) raw(prev + i - 2) & 0xff else 0
            val pp = a + b - cc
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - cc)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
            raw(base + i) = (raw(base + i) + pred).toByte; i += 1
          }
        case _ => return null
      }
      // sample conversion: the hottest loop of the decode (48 of the
      // 72 µs/tile before r8). Reading 8 filtered bytes per
      // `Platform.getLong` (JIT-intrinsified single load) and
      // byteswapping each 16-bit lane replaces two bounds-checked
      // byte loads + shift/or per sample — same big-endian u16
      // semantics, bit-identical output.
      var c = 0
      val o0 = row * w
      if (ImageCodec.nativeLE) {
        val lim = w - 3
        while (c < lim) {
          val l = org.apache.spark.unsafe.Platform.getLong(raw,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET +
              base + 2 * c)
          out(o0 + c) =
            ((java.lang.Short.reverseBytes(l.toShort) & 0xffff)
              - PngOffset).toFloat
          out(o0 + c + 1) =
            ((java.lang.Short.reverseBytes((l >>> 16).toShort) & 0xffff)
              - PngOffset).toFloat
          out(o0 + c + 2) =
            ((java.lang.Short.reverseBytes((l >>> 32).toShort) & 0xffff)
              - PngOffset).toFloat
          out(o0 + c + 3) =
            ((java.lang.Short.reverseBytes((l >>> 48).toShort) & 0xffff)
              - PngOffset).toFloat
          c += 4
        }
      }
      while (c < w) {
        val v = ((raw(base + 2 * c) & 0xff) << 8) | (raw(base + 2 * c + 1) & 0xff)
        out(o0 + c) = (v - PngOffset).toFloat
        c += 1
      }
      ri += rowBytes + 1
      row += 1
    }
    out
  }

  def encodeJpg(px: Array[Float], w: Int, h: Int,
      quality: Float = 0.95f): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < px.length) {
      val v = Math.round(px(i))
      raster.setSample(i % w, i / w, 0, math.max(0, math.min(255, v)))
      i += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    ios.flush(); writer.dispose()
    bos.toByteArray
  }

  def decodeJpg(bytes: Array[Byte]): Array[Float] = {
    val img = readVia(jpgReader, bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val out = new Array[Float](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = raster.getSample(i % w, i / w, 0).toFloat
      i += 1
    }
    out
  }

  /** Decode dispatch on the tile table's `fmt` column. */
  def decode(bytes: Array[Byte], fmt: String): Array[Float] = fmt match {
    case "raw" => decodeRaw(bytes)
    case "png" => decodePng(bytes)
    case "jpg" | "jpeg" => decodeJpg(bytes)
    case other => throw new IllegalArgumentException(s"unknown fmt: $other")
  }

  private val pxScratch = ThreadLocal.withInitial[Array[Float]](
    () => Array.empty[Float])

  private def tlFloatBuf(n: Int): Array[Float] = {
    var b = pxScratch.get()
    if (b.length < n) { b = new Array[Float](n); pxScratch.set(b) }
    b
  }

  /** Kernel-path decode into a REUSED thread-local buffer: zero
    * allocation per tile on the raw and gray16-PNG paths. The result
    * may be LONGER than the image (callers index by grid dims) and is
    * valid only until the next decodeTL call on the same thread —
    * never let it escape the per-tile loop. Other formats fall back
    * to the allocating path (still correct, just not allocation-free). */
  def decodeTL(bytes: Array[Byte], fmt: String): Array[Float] = fmt match {
    case "raw" =>
      val n = bytes.length / 4
      val out = tlFloatBuf(n)
      if (nativeLE) {
        org.apache.spark.unsafe.Platform.copyMemory(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, out,
          org.apache.spark.unsafe.Platform.FLOAT_ARRAY_OFFSET, n * 4L)
      } else {
        java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
          .get(out, 0, n)
      }
      out
    case "png" =>
      val fast = decodePngGray16Impl(bytes, reuseOut = true)
      if (fast != null) fast else decodePng(bytes)
    case _ => decode(bytes, fmt)
  }

  def psnrDb(a: Array[Float], b: Array[Float], peak: Double): Double = {
    require(a.length == b.length && a.nonEmpty)
    var mse = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      mse += d * d
      i += 1
    }
    mse /= a.length
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(peak * peak / mse)
  }

  /** Perceptual average-hash of a pixel tile: mean-threshold bits of an
    * 8×8 box-downsample, row-major from the MSB. Deterministic, no RNG. */
  def averageHash(px: Array[Float], w: Int, h: Int): Long = {
    val cells = new Array[Double](64)
    val counts = new Array[Int](64)
    var i = 0
    while (i < px.length) {
      val r = (i / w) * 8 / h
      val c = (i % w) * 8 / w
      cells(r * 8 + c) += px(i); counts(r * 8 + c) += 1
      i += 1
    }
    var mean = 0.0
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) cells(k) /= counts(k)
      mean += cells(k); k += 1
    }
    mean /= 64
    var bits = 0L
    k = 0
    while (k < 64) {
      if (cells(k) > mean) bits |= (1L << (63 - k))
      k += 1
    }
    bits
  }
}

/** XXH64 (public-domain algorithm, xxhash.com spec) — deterministic
  * 64-bit content hash used for the tile table's `phash` column and
  * for exact-dedup fingerprints. */
object XXHash64 {
  private val P1 = -7046029288634856825L // 11400714785074694791
  private val P2 = -4417276706812531889L // 14029467366897019727
  private val P3 = 1609587929392839161L
  private val P4 = -8796714831421723037L // 9650029242287828579
  private val P5 = 2870177450012600261L

  def hash(data: Array[Byte], seed: Long = 0L): Long = {
    val len = data.length
    var h: Long = 0L
    var i = 0
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, readLong(data, i))
        v2 = round(v2, readLong(data, i + 8))
        v3 = round(v3, readLong(data, i + 16))
        v4 = round(v4, readLong(data, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) +
        java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) +
        java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, readLong(data, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (readInt(data, i) & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (data(i) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  def hashString(s: String, seed: Long = 0L): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  private def readLong(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) | ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24) | ((d(i + 4) & 0xffL) << 32) |
      ((d(i + 5) & 0xffL) << 40) | ((d(i + 6) & 0xffL) << 48) |
      ((d(i + 7) & 0xffL) << 56)

  private def readInt(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8) | ((d(i + 2) & 0xff) << 16) |
      ((d(i + 3) & 0xff) << 24)
}
