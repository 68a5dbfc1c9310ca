package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental (delta-vs-corpus) MinHash dedup: the result over a
  * batch must equal the FULL-corpus dedup filtered to pairs touching
  * the batch, across every structural case — fresh near-dup of a
  * corpus doc, fresh×fresh pair, and the gained-group case (a batch
  * doc exactly duplicating corpus content inherits the group's whole
  * neighborhood, including its intra-group twins). */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val NumHashes = 24
  private val NumBands = 12 // rows=2: near-dups collide w.h.p.
  private val MinJ = 0.5

  // corpus: group A = {1, 2} (exact dups), B = 3 (near-dup of A),
  // C = 4 (unrelated), D = 5 (unrelated)
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    (3L, "alpha beta gamma delta epsilon theta"),
    (4L, "one two three four five six"),
    (5L, "red orange yellow green blue violet"))
  // batch: 10 exactly duplicates A (gained group — must pair with
  // 1, 2 AND near-dup 3); 11 is a fresh near-dup of corpus 4;
  // 12 and 13 are fresh near-dups of each other; 14 is unique
  private val batch = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"),
    (11L, "one two three four five seven"),
    (12L, "lorem ipsum dolor sit amet consectetur"),
    (13L, "lorem ipsum dolor sit amet elit"),
    (14L, "completely unrelated text entirely"))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_EVEN)))
      .toSet

  test("incremental result equals full recompute filtered to " +
      "batch-touching pairs, and the gained-group neighborhood is " +
      "present") {
    val corpusDf = corpus.toDF("doc_id", "text")
    val batchDf = batch.toDF("doc_id", "text")
    val idx = TextOps.minhashIndex(corpusDf, "doc_id", "text",
      NumHashes, NumBands)
    val inc = pairs(TextOps.minhashDedupIncremental(idx, batchDf,
      "doc_id", "text", MinJ))

    val full = pairs(TextOps.minhashDedup(
      corpusDf.unionByName(batchDf), "doc_id", "text",
      NumHashes, NumBands, MinJ))
    val batchIds = batch.map(_._1).toSet
    val expected = full.filter(p =>
      batchIds.contains(p._1) || batchIds.contains(p._2))
    assert(inc == expected,
      s"incremental=$inc\nexpected(full filtered)=$expected")

    // the structural cases, pinned explicitly
    val keys = inc.map(p => (p._1, p._2))
    assert(keys.contains((1L, 10L)) && keys.contains((2L, 10L)),
      "gained group: batch doc must pair with its exact corpus twins")
    assert(keys.contains((3L, 10L)),
      "gained group: batch doc must inherit the group's near-dups")
    assert(keys.contains((4L, 11L)), "fresh x corpus near-dup")
    assert(keys.contains((12L, 13L)), "fresh x fresh near-dup")
    assert(!keys.exists(k => k._1 == 14L || k._2 == 14L),
      "unique batch doc pairs with nothing")
    assert(!keys.contains((1L, 2L)) && !keys.contains((1L, 3L)),
      "corpus-internal pairs must never be re-emitted")
    graft.engine.Caches.drain(spark)
  }

  test("index maintenance loop: appending batches reproduces the " +
      "from-scratch index and accumulates exactly the full dedup " +
      "pairs") {
    val all = (corpus ++ batch).sortBy(_._1)
    val batches = all.grouped(4).toSeq // 3 monotonic-id ingest batches
    var idx = TextOps.minhashIndex(
      batches.head.toDF("doc_id", "text"), "doc_id", "text",
      NumHashes, NumBands)
    var accum = Set.empty[(Long, Long, BigDecimal)]
    for (b <- batches.tail) {
      val bDf = b.toDF("doc_id", "text")
      accum ++= pairs(TextOps.minhashDedupIncremental(idx, bDf,
        "doc_id", "text", MinJ))
      idx = TextOps.minhashIndexAppend(idx, bDf, "doc_id", "text")
    }
    // pairs: first batch's internal pairs come from its own index
    // build; everything else accumulated incrementally
    val first = batches.head.map(_._1).toSet
    val full = pairs(TextOps.minhashDedup(all.toDF("doc_id", "text"),
      "doc_id", "text", NumHashes, NumBands, MinJ))
    val expected = full.filterNot(p =>
      first.contains(p._1) && first.contains(p._2))
    assert(accum == expected,
      s"accum=$accum\nexpected=$expected")
    // the maintained index IS the from-scratch index (monotonic ids:
    // every group keeps its min-id representative)
    val scratch = TextOps.minhashIndex(all.toDF("doc_id", "text"),
      "doc_id", "text", NumHashes, NumBands)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map {
        case a: Seq[_] => a.toList
        case x => x
      }).toSet
    assert(rowsOf(idx.members) == rowsOf(scratch.members))
    assert(rowsOf(idx.repToks) == rowsOf(scratch.repToks))
    assert(rowsOf(idx.repBands) == rowsOf(scratch.repBands))
    graft.engine.Caches.drain(spark)
  }

  test("null-text batch docs are never duplicates of anything") {
    val corpusDf = corpus.toDF("doc_id", "text")
    val batchDf = Seq((20L, null: String), (21L, null: String),
      (22L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val idx = TextOps.minhashIndex(corpusDf, "doc_id", "text",
      NumHashes, NumBands)
    val inc = pairs(TextOps.minhashDedupIncremental(idx, batchDf,
      "doc_id", "text", MinJ))
    assert(!inc.exists(p => p._1 >= 20L && p._1 <= 21L) &&
      !inc.exists(p => p._2 >= 20L && p._2 <= 21L), inc.toString)
    assert(inc.map(p => (p._1, p._2)) ==
      Set((1L, 22L), (2L, 22L), (3L, 22L)))
    graft.engine.Caches.drain(spark)
  }
}
