package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hot-bucket guard (round-5): LSH band joins must collapse
  * exact-duplicate content BEFORE banding, so a cluster of m identical
  * documents/images costs candidate rows proportional to DISTINCT
  * contents, never m² — the classic web-corpus dedup scale-killer
  * (boilerplate pages, blank images). */
class HotBucketSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  // the dedup operators register caches for the harness to drain
  // between queries — this suite is such a harness (the shared
  // session outlives it)
  override def afterEach(): Unit = {
    graft.engine.Caches.drain(spark)
    super.afterEach()
  }

  /** The q_minhash_clusters fixture: 1000 exact copies + 5 near-dup
    * variants × 10 copies + 100 singletons = 1150 docs, 106 distinct
    * contents. */
  private def fixture = graft.engine.DataQueries.clusterDocs(spark)

  test("minhash candidate join runs over representatives: candidate " +
      "pairs scale with distinct contents, not the 10³ cluster's m²") {
    // reproduce the operator's internal rep pipeline stage by stage
    val docs = fixture
    val members = docs.select(col("doc_id").as("id"),
      TextOps.tokenSetKey(col("text")).as("ckey"))
    assert(members.count() === 1150)
    val nDistinct = members.select("ckey").distinct().count()
    assert(nDistinct === 106)
    // reps = min id per content group
    val reps = members.groupBy("ckey").agg(min("id").as("id"))
      .join(docs.withColumnRenamed("doc_id", "id"), Seq("id"))
    val hashes = TextOps.tokenHashes(reps, "id", "text")
    val sig = TextOps.minhashSignature(hashes, 8)
    val cand = TextOps.lshCandidatePairs(sig, 4, 2).count()
    // un-collapsed, the 1000-copy cluster ALONE would be
    // 1000*999/2 = 499500 candidates; rep-level candidates are
    // bounded by C(106,2) = 5565
    assert(cand <= 5565, s"candidates not rep-level: $cand")
    assert(cand < 100, s"expected a handful of rep candidates: $cand")
  }

  test("minhashDedup expands member pairs correctly (exact dups " +
      "jaccard 1.0, cross pairs inherit the rep jaccard)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "aa bb cc dd"),
      (4L, "aa bb cc ee"), // jaccard 3/5 = 0.6 vs group {1,2,3}
      (5L, "zz yy xx ww")).toDF("doc_id", "text")
    val pairs = TextOps.minhashDedup(docs, "doc_id", "text",
      numHashes = 8, numBands = 4, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    val intra = pairs.filter(p => p._3 == 1.0).map(p => (p._1, p._2))
    assert(intra.toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val cross = pairs.filter(p => p._3 != 1.0)
    // doc 4 vs each of {1,2,3} IF its signature shares a band —
    // deterministic; whatever LSH finds, all three members must agree
    assert(cross.map(_._3).distinct.length <= 1)
    if (cross.nonEmpty) {
      assert(cross.map(p => (p._1, p._2)).toSeq ===
        Seq((1L, 4L), (2L, 4L), (3L, 4L)))
      assert(math.abs(cross.head._3 - 0.6) < 1e-15)
    }
  }

  test("null-text docs are never duplicates (of each other or of " +
      "whitespace-only docs) — engine matches the oracle's semantics") {
    import spark.implicits._
    // tokenHashes drops null-text docs (no token rows), so the batch
    // path, the q_minhash_lsh DuckDB oracle and signatureDedupStream
    // all treat them as never-duplicates; contentGroups must agree
    // (md5 of the null token set would otherwise equal md5("") — the
    // whitespace-only doc's key)
    val docs = Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "   "), (4L, "aa bb"), (5L, "aa bb")).toDF("doc_id", "text")
    val pairs = TextOps.minhashDedup(docs, "doc_id", "text",
      numHashes = 8, numBands = 4, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq.sorted === Seq((4L, 5L)))
    val clusters = TextOps.minhashDedupClusters(docs, "doc_id", "text",
      numHashes = 8, numBands = 4, minJaccard = 0.5, maxBandFreq = 100)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(clusters(1L) && clusters(2L) && clusters(3L),
      "null-text / whitespace docs must each be their own canonical")
    assert(Seq(4L, 5L).count(clusters(_)) === 1,
      "the real duplicate pair keeps exactly one canonical")
  }

  test("minhashDedupClusters puts the 10³ cluster in one component " +
      "with one canonical doc; singletons stay alone") {
    val out = graft.engine.DataQueries.minhashClusters(spark, "")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === 1150)
    // the exact-dup cluster (0..999) all share comp 0
    val c0 = out.filter(_._1 < 1000)
    assert(c0.forall(_._2 === 0L))
    assert(c0.count(_._3) === 1 && c0.find(_._3).get._1 === 0L)
    // singletons (1050..1149) are their own canonical components
    val singles = out.filter(_._1 >= 1050)
    assert(singles.forall(t => t._2 === t._1 && t._3))
    // exactly one canonical per component
    val byComp = out.groupBy(_._2)
    assert(byComp.forall { case (_, ms) => ms.count(_._3) === 1 })
  }

  test("dhash near-dup join collapses identical hash values; a " +
      "1000-copy blank-image cluster yields value-level candidates") {
    import spark.implicits._
    // 1000 identical hashes + 3 distinct others (one within Hamming 1)
    val rows = (0 until 1000).map(i => (f"blank_$i%04d", 0x0L)) ++
      Seq(("near", 0x1L), ("far", 0x7777L), ("other", 0x00f0f0L))
    val df = rows.toDF("image_id", "dhash")
    val pairs = ImageOps.dhashNearDupPairs(df, "image_id", "dhash",
      bands = 4, bitsPerBand = 14, maxHamming = 2)
    // output pairs: C(1000,2) intra + 1000 blank×near + 0 others
    assert(pairs.count() === 1000L * 999 / 2 + 1000)
    // hamming values: 0 for intra, 1 for the near pair
    val h = pairs.groupBy("hamming").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(h(0) === 1000L * 999 / 2 && h(1) === 1000L)
  }

  test("dhashNearDupPairs refuses maxHamming past the pigeonhole " +
      "guarantee (maxHamming <= bands - 1)") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("image_id", "dhash")
    val e = intercept[IllegalArgumentException] {
      ImageOps.dhashNearDupPairs(df, "image_id", "dhash",
        bands = 4, bitsPerBand = 14, maxHamming = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("the per-bucket frequency cap drops adversarial buckets " +
      "loudly but keeps everything else") {
    import spark.implicits._
    // 40 distinct values that all share band 0 (low 14 bits = 0) +
    // two close values elsewhere
    val rows = (1 to 40).map(i => (f"adv_$i%02d", i.toLong << 14)) ++
      Seq(("x", 0x3fffL), ("y", 0x3ffeL))
    val df = rows.toDF("image_id", "dhash")
    val capped = ImageOps.dhashNearDupPairs(df, "image_id", "dhash",
      bands = 4, bitsPerBand = 14, maxHamming = 1, maxBandFreq = 8)
    // the 40-value bucket is dropped; (x,y) at Hamming 1 survives
    // via an uncrowded band
    val got = capped.select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("x", "y")))
  }
}
