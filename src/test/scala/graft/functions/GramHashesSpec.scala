package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rolling Rabin–Karp gram hashes: the rolling recurrence must equal
  * the direct Σ byte·B^j definition at every position, across ASCII
  * and multi-byte inputs, with clean edges. */
class GramHashesSpec extends SparkSpec {

  private def naive(s: String, k: Int): Seq[Long] = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val P = GramHashesImpl.P
    (0 to bytes.length - k).map { i =>
      var h = java.math.BigInteger.ZERO
      val b = java.math.BigInteger.valueOf(GramHashesImpl.B)
      for (j <- 0 until k)
        h = h.multiply(b)
          .add(java.math.BigInteger.valueOf(bytes(i + j) & 0xff))
      h.mod(java.math.BigInteger.valueOf(P)).longValue()
    }
  }

  private def viaSpark(s: String, k: Int): Seq[Long] = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t")
      .select(functions.gram_hashes(col("t"), k).as("h"))
      .collect()(0).getSeq[Long](0)
  }

  test("rolling equals the direct polynomial definition") {
    for (s <- Seq("the quick brown fox", "aaaaaaaaaa", "ab",
        "x" * 500, "mixed 123 !@# text with  spaces");
        k <- Seq(1, 3, 8)) {
      if (s.length >= k)
        assert(viaSpark(s, k) === naive(s, k), s"k=$k s=${s.take(20)}")
    }
  }

  test("multi-byte UTF-8 hashes over bytes, deterministically") {
    val s = "héllo wörld — 的是"
    assert(viaSpark(s, 4) === naive(s, 4))
  }

  test("strings shorter than k yield an empty array") {
    assert(viaSpark("ab", 8) === Seq.empty)
    assert(viaSpark("", 3) === Seq.empty)
  }

  test("WinnowSelect matches the brute-force window-min (rightmost " +
      "ties) on random and adversarial inputs") {
    def brute(hs: Array[Long], w: Int): Seq[(Int, Long)] =
      (0 to hs.length - w).map { i =>
        // min by (h asc, pos desc) — the SWA rightmost-tie rule
        val sel = (i until i + w).minBy(j => (hs(j), -j))
        (sel + 1, hs(sel))
      }.distinct
    def viaImpl(hs: Array[Long], w: Int): Seq[(Int, Long)] = {
      val arr = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(hs)
      val out = WinnowSelectImpl.compute(arr, w)
      (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2)
        (r.getInt(0), r.getLong(1))
      }
    }
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Array.fill(200)(rnd.nextInt(50).toLong), // many ties
      Array.fill(200)(rnd.nextLong().abs),
      Array.tabulate(50)(_.toLong), // ascending
      Array.tabulate(50)(i => (50 - i).toLong), // descending
      Array.fill(30)(7L)) // all equal
    for (hs <- cases; w <- Seq(1, 4, 6)) {
      assert(viaImpl(hs, w) === brute(hs, w), s"w=$w")
    }
    assert(viaImpl(Array(1L, 2L), 5) === Seq.empty) // shorter than w
  }

  test("the rolling fingerprint stage is linear, not quadratic: 4x " +
      "doc length costs ~4x, far from the 11.8x the lambda " +
      "formulation measured") {
    import spark.implicits._
    def wall(chars: Int): Double = {
      val docs = (1 to 50).map(i => (i.toLong,
        Seq.tabulate(chars / 8)(j => s"w${(i * 31 + j * 7) % 997}")
          .mkString(" ").take(chars))).toDF("doc_id", "text")
      val t0 = System.nanoTime()
      graft.operators.TextOps.winnowFingerprintsRolling(
        docs, "doc_id", "text", k = 8, w = 6).count()
      (System.nanoTime() - t0) / 1e9
    }
    wall(500) // warm-up (codegen)
    val t1 = wall(1000)
    val t4 = wall(4000)
    assert(t4 < t1 * 8 + 1.0,
      f"4x length cost ${t4 / t1}%.1fx ($t1%.2fs -> $t4%.2fs) — " +
        "the selection is not linear")
  }

  test("winnowFingerprintsRolling selects the same positions as the " +
      "md5 path (selection depends only on hash ORDER statistics " +
      "within windows, which both paths draw uniformly)") {
    import spark.implicits._
    // not a bit-equality claim (different hash functions) — a sanity
    // check that the rolling path emits the SWA guarantee: any two
    // docs sharing a substring of length >= w + k - 1 share a
    // fingerprint
    val shared = "common shared boilerplate fragment of text"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"other beginning $shared different tail"),
      (3L, "entirely unrelated content with no overlap at all"))
      .toDF("doc_id", "text")
    val fps = graft.operators.TextOps.winnowFingerprintsRolling(
      docs, "doc_id", "text", k = 8, w = 6)
    val byDoc = fps.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "docs sharing a long substring must share a fingerprint")
  }
}
