package graft.operators

import graft.SparkSpec

/** Winnowing fingerprint properties (Schleimer–Wilkerson–Aiken):
  * the scheme's guarantee and density, plus the tie rule, verified
  * against a trivial single-threaded reimplementation. */
class WinnowSpec extends SparkSpec {
  private val k = 5
  private val w = 4

  private def fingerprints(docs: Seq[(Long, String)])
      : Map[Long, Set[(Int, Long)]] = {
    import spark.implicits._
    TextOps.winnowFingerprints(docs.toDF("doc_id", "text"),
      "doc_id", "text", k, w)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getInt(1), r.getLong(2))).toSet
      }
  }

  /** Reference winnowing in plain Scala: same md5 gram hash. */
  private def oracle(text: String): Set[(Int, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % TextOps.MinHashP
    }
    val n = text.length - k + 1
    if (n < w) return Set.empty
    val grams = (1 to n).map(i => (h(text.substring(i - 1, i - 1 + k)), i))
    (1 to n - w + 1).map { i =>
      val win = grams.slice(i - 1, i - 1 + w)
      val mh = win.map(_._1).min
      val pos = win.filter(_._1 == mh).map(_._2).max // rightmost tie
      (pos, mh)
    }.toSet
  }

  test("matches the single-threaded reference on random-ish text") {
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog repeatedly",
      2L -> "aaaaaaaaaaaaaaaaaaaaaa", // all-equal hashes: tie rule
      3L -> "abcabcabcabcabcabcabcabc", // periodic: repeated hashes
      4L -> ("spark zonal " * 12).trim)
    val got = fingerprints(texts)
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) === oracle(t), s"doc $id")
    }
  }

  test("SWA guarantee: a shared substring of length >= w+k-1 shares" +
      " a fingerprint") {
    val shared = "xyzqrstuvw" // length 10 >= w+k-1 = 8
    val docs = Seq(
      10L -> s"prefix aaa $shared zz suffix here padding",
      11L -> s"completely different start $shared other tail")
    val fps = fingerprints(docs)
    val common = fps(10L).map(_._2) intersect fps(11L).map(_._2)
    assert(common.nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("docs shorter than k+w-1 emit nothing; density is bounded") {
    val docs = Seq(20L -> "short", 21L -> ("abcdefgh " * 30).trim)
    val fps = fingerprints(docs)
    assert(!fps.contains(20L))
    val n = docs(1)._2.length - k + 1
    // winnowing keeps ~2/(w+1) of grams; allow generous slack but
    // require real compression vs emitting every gram
    assert(fps(21L).size < n / 2)
  }

  test("near-dup pairs: duplicated text found, unrelated not") {
    import spark.implicits._
    val base = "one two three four five six seven eight nine ten " * 3
    val docs = Seq(
      30L -> base, 31L -> (base + " tail change"),
      32L -> "entirely unrelated content with no overlap at all zz")
      .toDF("doc_id", "text")
    val pairs = TextOps.winnowNearDupPairs(docs, "doc_id", "text",
      k, w, minShared = 3, maxDocFreq = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((30L, 31L)))
    assert(!pairs.exists(p => p._1 == 32L || p._2 == 32L))
    graft.engine.Caches.drain(spark)
  }
}
