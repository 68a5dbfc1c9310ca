package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {
  private def samplePx(n: Int): Array[Float] = {
    val px = new Array[Float](n)
    var i = 0
    while (i < n) {
      px(i) = if (i % 23 == 0) -9999.0f else (i * 31 % 97).toFloat
      i += 1
    }
    px
  }

  test("raw roundtrip is byte-exact") {
    val px = samplePx(256)
    val dec = ImageCodec.decodeRaw(ImageCodec.encodeRaw(px))
    assert(dec.toSeq === px.toSeq)
  }

  test("png roundtrip is exact for integer values incl nodata") {
    val px = samplePx(256)
    val dec = ImageCodec.decodePng(ImageCodec.encodePng(px, 16, 16))
    assert(dec.toSeq === px.toSeq)
  }

  test("jpg roundtrip meets the PSNR >= 40 dB gate (input_hint)") {
    // values in [0,255], smooth field (JPEG-friendly), no nodata
    val px = new Array[Float](64 * 64)
    for (r <- 0 until 64; c <- 0 until 64)
      px(r * 64 + c) = (128 + 100 * math.sin(r / 9.0) *
        math.cos(c / 11.0)).toFloat.max(0f).min(255f).round.toFloat
    val dec = ImageCodec.decodeJpg(ImageCodec.encodeJpg(px, 64, 64))
    val psnr = ImageCodec.psnrDb(px, dec, 255.0)
    assert(psnr >= 40.0, s"psnr=$psnr")
  }

  test("q_jpeg_psnr's mse gate is equivalent to PSNR >= 40 dB and " +
      "discriminates a wrong decode") {
    // the driver query replaces 10·log10(255²/mse) >= 40 with
    // mse <= 255²/10⁴ — prove the algebra on a real roundtrip…
    val px = new Array[Float](16 * 16)
    for (r <- 0 until 16; c <- 0 until 16) px(r * 16 + c) = (r + c).toFloat
    val dec = ImageCodec.decodeJpg(ImageCodec.encodeJpg(px, 16, 16))
    def mse(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum /
        a.length
    val gate = 255.0 * 255.0 / 1e4
    assert((mse(px, dec) <= gate) ===
      (ImageCodec.psnrDb(px, dec, 255.0) >= 40.0))
    assert(mse(px, dec) <= gate, "gradient roundtrip must pass the gate")
    // …and that a WRONG pixel field (what a broken decode would
    // yield) lands far below it — the boolean is not vacuously true
    val wrong = px.map(v => (v * 31 % 97).toFloat)
    assert(mse(px, wrong) > gate * 10,
      "gate failed to discriminate a wrong decode")
  }

  test("xxh64 known vectors") {
    // public XXH64 test vectors (xxhash spec)
    assert(XXHash64.hash(Array.emptyByteArray, 0L) === 0xEF46DB3751D8E999L)
    val abc = "abc".getBytes("UTF-8")
    assert(XXHash64.hash(abc, 0L) === 0x44BC2CF5AD770999L)
    // >32-byte input exercises the 4-lane loop
    val long = ("0123456789abcdef" * 4).getBytes("UTF-8")
    assert(XXHash64.hash(long, 0L) !== XXHash64.hash(long, 1L))
    assert(XXHash64.hash(long, 0L) === XXHash64.hash(long.clone(), 0L))
  }

  test("average hash is deterministic and contrast-sensitive") {
    val a = samplePx(256)
    val b = a.map(v => -v)
    assert(ImageCodec.averageHash(a, 16, 16) ===
      ImageCodec.averageHash(a.clone(), 16, 16))
    assert(ImageCodec.averageHash(a, 16, 16) !==
      ImageCodec.averageHash(b, 16, 16))
  }
}

class PngFastPathSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("custom gray16 PNG decoder matches ImageIO bit-for-bit") {
    val grid = graft.synth.Synth.testGrid
    for (tr <- 0 until 8; tc <- 0 until 8 by 3) {
      val px = graft.synth.Synth.tilePixels(grid, tr, tc)
      val png = ImageCodec.encodePng(px, grid.tileW, grid.tileH)
      val fast = ImageCodec.decodePngGray16(png)
      assert(fast != null, "fast path must handle our own encoding")
      assert(fast.toSeq === px.toSeq, s"tile ($tr,$tc)")
    }
  }

  test("fast path rejects non-gray16 PNGs and falls back") {
    // 8-bit RGB png via BufferedImage
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(ImageCodec.decodePngGray16(bos.toByteArray) === null)
  }
}

class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("GraftExtensions register SQL functions") {
    // use the shared session (extensions can't apply to an existing
    // session, so exercise the runtime registration path too)
    val spark = graft.SparkSpec.session
    GraftExtensions.register(spark)
    try {
      val r = spark.sql(
        """SELECT is_close(0.0500001, 0.05) AS c1,
                  is_close(0.06, 0.05) AS c2,
                  cell_id(10.0D, 20.0D, 8) AS cell,
                  xxh64(CAST('abc' AS BINARY)) AS h""").collect()(0)
      assert(r.getBoolean(0) === true)
      assert(r.getBoolean(1) === false)
      assert(r.getLong(2) === graft.geom.Morton.cellId(10.0, 20.0, 8))
      assert(r.getLong(3) === XXHash64.hash("abc".getBytes("UTF-8")))
    } finally { /* shared-JVM session: leave running for other suites */ }
  }
}
