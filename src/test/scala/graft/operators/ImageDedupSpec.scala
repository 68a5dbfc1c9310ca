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

  test("incremental dhash dedup equals the full recompute filtered " +
      "to batch-touching pairs (fresh, gained and batch-batch " +
      "values)") {
    import spark.implicits._
    // corpus: values A (two members), B (near A, Hamming 1), C (far);
    // batch: a GAINED copy of A (must inherit A–B's neighborhood),
    // a fresh value near C, and two fresh exact-dup members
    val vA = 0x0f0f0f0fL
    val vB = vA ^ 1L
    val vC = 0x70f0f0f0aaaaL
    val vD = vC ^ (1L << 20)
    val vE = 0x123456789abcL
    val corpus = Seq(("c1", vA), ("c2", vA), ("c3", vB), ("c4", vC))
      .toDF("image_id", "dhash")
    val batch = Seq(("n1", vA), ("n2", vD), ("n3", vE), ("n4", vE))
      .toDF("image_id", "dhash")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val idx = ImageOps.dhashIndex(corpus, "image_id", "dhash",
      bands = 4, bitsPerBand = 14)
    val inc = pairs(ImageOps.dhashNearDupIncremental(idx, batch,
      "image_id", "dhash", maxHamming = 2))
    val full = pairs(ImageOps.dhashNearDupPairs(
      corpus.unionByName(batch), "image_id", "dhash",
      bands = 4, bitsPerBand = 14, maxHamming = 2))
    val batchIds = Set("n1", "n2", "n3", "n4")
    val expected = full.filter(p =>
      batchIds.contains(p._1) || batchIds.contains(p._2))
    assert(inc == expected, s"inc=$inc\nexpected=$expected")
    val keys = inc.map(p => (p._1, p._2))
    assert(keys((("c1", "n1"))) && keys((("c2", "n1"))),
      "gained value must pair with its exact corpus twins")
    assert(keys((("c3", "n1"))),
      "gained value must inherit its Hamming neighborhood")
    assert(keys((("c4", "n2"))), "fresh value x corpus")
    assert(keys((("n3", "n4"))), "batch-batch exact dups")
    assert(!keys((("c1", "c2"))) && !keys((("c1", "c3"))),
      "corpus-internal pairs must never re-emit")
  }
}
