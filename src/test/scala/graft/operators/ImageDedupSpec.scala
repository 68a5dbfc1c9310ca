package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dHash perceptual-dedup properties beyond the driver oracle's
  * bit-exactness: invariance and band-join recall. */
class ImageDedupSpec extends SparkSpec {

  private def hashOf(px: Array[Float]): Long = {
    import spark.implicits._
    Seq(Tuple1(px)).toDF("px")
      .select(ImageOps.dHash(col("px"), 16, 16, 2).as("dh"))
      .collect()(0).getLong(0)
  }

  test("dHash is invariant to brightness shift and contrast scale") {
    val base = Array.tabulate(256)(i => ((i * 31 + 7) % 97).toFloat)
    val dh = hashOf(base)
    assert(hashOf(base.map(_ + 50f)) === dh, "brightness shift")
    assert(hashOf(base.map(_ * 3f)) === dh, "contrast scale")
  }

  test("a single-pixel change flips at most a few bits; band join" +
      " still pairs them") {
    import spark.implicits._
    val base = Array.tabulate(256)(i => ((i * 31 + 7) % 97).toFloat)
    val tweaked = base.clone()
    tweaked(0) = 96f // one sampled pixel changed
    val dhA = hashOf(base); val dhB = hashOf(tweaked)
    val hamming = java.lang.Long.bitCount(dhA ^ dhB)
    assert(hamming <= 2, s"one pixel flipped $hamming bits")
    val pairs = ImageOps.dhashNearDupPairs(
      Seq(("a", dhA), ("b", dhB)).toDF("image_id", "dhash"),
      "image_id", "dhash", bands = 4, bitsPerBand = 14, maxHamming = 3)
      .collect()
    assert(pairs.length === 1 && pairs(0).getString(0) === "a")
  }
}
