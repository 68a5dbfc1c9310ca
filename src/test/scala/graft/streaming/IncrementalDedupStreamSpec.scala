package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import java.nio.file.{Files, Paths}

/** The continuously-deduped-corpus sink: batches folded through
  * [[DocStream.incrementalDedupSink]] must accumulate exactly the
  * full-corpus near-dup pairs, survive batch replays as no-ops, and
  * redo a crashed batch without duplicating or losing output. */
class IncrementalDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val NumHashes = 24
  private val NumBands = 12
  private val MinJ = 0.5

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    (3L, "alpha beta gamma delta epsilon theta"),
    (4L, "one two three four five six"),
    (5L, "red orange yellow green blue violet"),
    (10L, "alpha beta gamma delta epsilon zeta"),
    (11L, "one two three four five seven"),
    (12L, "lorem ipsum dolor sit amet consectetur"),
    (13L, "lorem ipsum dolor sit amet elit"),
    (14L, "completely unrelated text entirely"))

  private def pairSet(df: DataFrame) =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_EVEN))).toSet

  test("batches through the sink accumulate the full-corpus dedup; " +
      "replay is a no-op; a crashed batch redoes cleanly") {
    val work = Files.createTempDirectory("graft-incr-stream").toString
    val indexDir = s"$work/index"
    val pairsDir = s"$work/pairs"
    val sink = DocStream.incrementalDedupSink(indexDir, pairsDir,
      "doc_id", "text", NumHashes, NumBands, MinJ)
    val batches = docs.grouped(4).toSeq.zipWithIndex
      .map { case (b, i) => (b.toDF("doc_id", "text"), i.toLong) }
    batches.foreach { case (df, id) => sink(df, id) }

    def allPairs() = pairSet(
      spark.read.parquet(s"$pairsDir/*-batch-*"))
    val expected = pairSet(TextOps.minhashDedup(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      NumHashes, NumBands, MinJ))
    assert(allPairs() == expected,
      s"stream=${allPairs()}\nfull=$expected")

    // replay of an applied batch: marker present, pure no-op
    sink(batches(1)._1, 1L)
    assert(allPairs() == expected, "replay changed the pair log")

    // crash simulation: the last batch's marker vanishes (crash
    // before the marker landed) — the redo must overwrite, not
    // append, and converge to the same state
    val lastId = batches.last._2
    Files.delete(Paths.get(indexDir, s"done-default-$lastId"))
    sink(batches.last._1, lastId)
    assert(allPairs() == expected, "crash redo diverged")
    assert(Files.exists(Paths.get(indexDir, s"done-default-$lastId")))

    // the final on-disk index equals a from-scratch index over all
    // docs fed so far (so the NEXT batch sees the whole corpus)
    val lastSeq = Files.readString(
      Paths.get(indexDir, s"done-default-$lastId")).trim.toLong
    assert(lastSeq == batches.size,
      s"expected ${batches.size} published versions, marker says $lastSeq")
    val idx = TextOps.loadMinhashIndex(spark, s"$indexDir/v$lastSeq")
    val scratch = TextOps.minhashIndex(docs.toDF("doc_id", "text"),
      "doc_id", "text", NumHashes, NumBands)
    def rows(df: DataFrame) = df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList
      case x => x
    }).toSet
    assert(rows(idx.members) == rows(scratch.members))
    assert(rows(idx.repToks) == rows(scratch.repToks))
    assert(rows(idx.repBands) == rows(scratch.repBands))
    graft.engine.Caches.drain(spark)
  }

  test("a fresh-checkpoint restart (new writer id, batch ids back " +
      "at 0) is NOT swallowed as a replay and continues the chain") {
    val work = Files.createTempDirectory("graft-incr-writer").toString
    val indexDir = s"$work/index"
    val pairsDir = s"$work/pairs"
    // incarnation 1 applies the first 5 docs as its batch 0...
    val sinkA = DocStream.incrementalDedupSink(indexDir, pairsDir,
      "doc_id", "text", NumHashes, NumBands, MinJ, writerId = "qA")
    sinkA(docs.take(5).toDF("doc_id", "text"), 0L)
    // ...then the checkpoint is lost; the restarted query gets a new
    // writer id and redelivers NEW data as ITS batch 0
    val sinkB = DocStream.incrementalDedupSink(indexDir, pairsDir,
      "doc_id", "text", NumHashes, NumBands, MinJ, writerId = "qB")
    sinkB(docs.drop(5).toDF("doc_id", "text"), 0L)
    val expected = pairSet(TextOps.minhashDedup(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      NumHashes, NumBands, MinJ))
    val got = pairSet(spark.read.parquet(s"$pairsDir/*-batch-*"))
    assert(got == expected,
      s"restart under a new writer lost data: got=$got expected=$expected")
    // the chain continued: two published versions, the second writer's
    // marker points at v2
    val seqB = Files.readString(
      Paths.get(indexDir, "done-qB-0")).trim.toLong
    assert(seqB == 2L, s"expected v2 from the second writer, got v$seqB")
    graft.engine.Caches.drain(spark)
  }

  test("save/load round-trips an index and the loaded index drives " +
      "incremental dedup identically") {
    val dir = Files.createTempDirectory("graft-idx-io").toString
    val corpus = docs.take(5).toDF("doc_id", "text")
    val batch = docs.drop(5).toDF("doc_id", "text")
    val mem = TextOps.minhashIndex(corpus, "doc_id", "text",
      NumHashes, NumBands)
    mem.save(dir)
    val loaded = TextOps.loadMinhashIndex(spark, dir)
    val a = pairSet(TextOps.minhashDedupIncremental(mem, batch,
      "doc_id", "text", MinJ))
    val b = pairSet(TextOps.minhashDedupIncremental(loaded, batch,
      "doc_id", "text", MinJ))
    assert(a == b && a.nonEmpty)
    graft.engine.Caches.drain(spark)
  }

  // ---- EMBEDDING modality (SRP index) ----

  /** 12 deterministic 8-dim vectors in 3 tight cosine clusters + 3
    * isolated — near-dup structure a stream must rediscover. */
  private def vecRows: Seq[(Long, Array[Float])] = {
    def v(base: Array[Float], eps: Float, k: Int): Array[Float] =
      base.zipWithIndex.map { case (x, i) =>
        x + (if (i % 3 == k % 3) eps else -eps) }
    val a = Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)
    val b = Array(-5f, 4f, -3f, 2f, -1f, 2f, -3f, 4f)
    val c = Array(9f, -1f, 1f, -9f, 3f, -3f, 5f, -5f)
    Seq(
      1L -> a, 2L -> v(a, 0.01f, 1), 3L -> v(a, 0.02f, 2),
      4L -> b, 5L -> v(b, 0.01f, 1),
      6L -> c, 7L -> v(c, 0.015f, 2), 8L -> v(c, 0.03f, 1),
      9L -> Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      10L -> Array(0f, 1f, -1f, 0f, 2f, 0f, -2f, 0f),
      11L -> Array(3f, 3f, -3f, -3f, 3f, 3f, -3f, -3f),
      12L -> v(a, 0.025f, 0))
  }

  private def srpPairSet(df: DataFrame) =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("embedding sink accumulates the full-corpus SRP dedup; " +
      "replay no-op; final index equals a from-scratch rebuild") {
    import graft.operators.Similarity
    val work = Files.createTempDirectory("graft-srp-stream").toString
    val (dim, planes, thr) = (8, 8, 0.999)
    val sink = DocStream.srpIncrementalDedupSink(s"$work/index",
      s"$work/pairs", "id", "vec", dim, planes, thr)
    val all = vecRows.toDF("id", "vec")
    val batches = vecRows.grouped(5).toSeq.zipWithIndex
      .map { case (b, i) => (b.toDF("id", "vec"), i.toLong) }
    batches.foreach { case (df, id) => sink(df, id) }
    def got() = srpPairSet(spark.read.parquet(s"$work/pairs/*-batch-*"))
    val expected = srpPairSet(Similarity.srpNearDupPairs(all, "id",
      "vec", dim, planes, thr))
    assert(got() == expected && expected.nonEmpty,
      s"stream=${got()}\nfull=$expected")
    sink(batches(1)._1, 1L) // replay
    assert(got() == expected, "replay changed the pair log")
    val lastSeq = Files.readString(Paths.get(s"$work/index",
      s"done-default-${batches.last._2}")).trim.toLong
    val idx = Similarity.loadSrpIndex(spark, s"$work/index/v$lastSeq")
    val scratch = Similarity.srpIndex(all, "id", "vec", dim, planes)
    assert(idx.dim == dim && idx.numPlanes == planes)
    def rows(df: DataFrame) = df.select("id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(idx.vectors) == rows(scratch.vectors))
    graft.engine.Caches.drain(spark)
  }

  // ---- IMAGE modality (dHash index) ----

  private val dhRows: Seq[(Long, Long)] = Seq(
    1L -> 0x0123456789abcdefL,
    2L -> 0x0123456789abcdefL,          // exact dup of 1
    3L -> 0x0123456789abcdecL,          // hamming 2 from 1
    4L -> 0x7777000011112222L,
    5L -> 0x7777000011112223L,          // hamming 1 from 4
    6L -> 0x5a5a5a5a5a5a5a5aL,
    7L -> -1L,
    8L -> 0x0123456789abcd0fL,          // hamming 3+ from 1
    9L -> 0x7777000011113222L,          // hamming 2 from 4
    10L -> 0L)

  test("image sink accumulates the full-corpus dHash dedup; replay " +
      "no-op; final index equals a from-scratch rebuild") {
    import graft.operators.ImageOps
    val work = Files.createTempDirectory("graft-dh-stream").toString
    val (bands, bpb, maxH) = (4, 16, 2)
    val sink = DocStream.dhashIncrementalDedupSink(s"$work/index",
      s"$work/pairs", "id", "dh", bands, bpb, maxH)
    val all = dhRows.toDF("id", "dh")
    val batches = dhRows.grouped(4).toSeq.zipWithIndex
      .map { case (b, i) => (b.toDF("id", "dh"), i.toLong) }
    batches.foreach { case (df, id) => sink(df, id) }
    def got() = spark.read.parquet(s"$work/pairs/*-batch-*")
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = ImageOps.dhashNearDupPairs(all, "id", "dh",
      bands, bpb, maxH)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got() == expected && expected.nonEmpty,
      s"stream=${got()}\nfull=$expected")
    sink(batches(0)._1, 0L) // replay
    assert(got() == expected, "replay changed the pair log")
    val lastSeq = Files.readString(Paths.get(s"$work/index",
      s"done-default-${batches.last._2}")).trim.toLong
    val idx = ImageOps.loadDhashIndex(spark, s"$work/index/v$lastSeq")
    val scratch = ImageOps.dhashIndex(all, "id", "dh", bands, bpb)
    assert(idx.bands == bands && idx.bitsPerBand == bpb)
    def members(df: DataFrame) = df.select("id", "dh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def vb(df: DataFrame) = df.select(col("dh"), col("key.band"),
      col("key.bits")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(members(idx.members) == members(scratch.members))
    assert(vb(idx.valueBands) == vb(scratch.valueBands))
    graft.engine.Caches.drain(spark)
  }

  // ---- takedowns interleaved with adds on ONE index chain ----

  test("takedown sink interleaves with the add sink on one version " +
      "chain: final index equals a from-scratch build of the " +
      "survivors, later batches dedup against the reduced corpus, " +
      "takedown replay is a no-op") {
    val work = Files.createTempDirectory("graft-td-stream").toString
    val indexDir = s"$work/index"
    val addSink = DocStream.incrementalDedupSink(indexDir,
      s"$work/pairs", "doc_id", "text", NumHashes, NumBands, MinJ,
      writerId = "adds")
    val tdSink = DocStream.minhashTakedownSink(indexDir,
      s"$work/takedowns", "doc_id", NumHashes, NumBands)
    // ingest the first 5 docs, take down doc 1 (the {1,2,10} group
    // rep at that point: {1,2} — promotion fires), ingest the rest
    addSink(docs.take(5).toDF("doc_id", "text"), 0L)
    tdSink(Seq(1L).toDF("doc_id"), 0L)
    addSink(docs.drop(5).toDF("doc_id", "text"), 1L)
    // replay of the takedown: marker present, no effect
    tdSink(Seq(1L).toDF("doc_id"), 0L)
    val lastSeq = Files.readString(
      Paths.get(indexDir, "done-adds-1")).trim.toLong
    assert(lastSeq == 3L, s"chain should be at v3, got v$lastSeq")
    val idx = TextOps.loadMinhashIndex(spark, s"$indexDir/v$lastSeq")
    val survivors = docs.filterNot(_._1 == 1L)
    val scratch = TextOps.minhashIndex(survivors.toDF("doc_id", "text"),
      "doc_id", "text", NumHashes, NumBands)
    def rows(df: DataFrame) = df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList
      case x => x
    }).toSet
    assert(rows(idx.members) == rows(scratch.members))
    assert(rows(idx.repToks) == rows(scratch.repToks))
    assert(rows(idx.repBands) == rows(scratch.repBands))
    // batch 1's pairs were computed AGAINST the reduced corpus: no
    // pair involves the removed doc
    val p1 = spark.read.parquet(s"$work/pairs/adds-batch-1")
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!p1.contains(1L), "a pair referenced the removed doc")
    assert(p1.nonEmpty)
    // the takedown log records what was applied
    val log = spark.read.parquet(s"$work/takedowns/takedown-batch-0")
      .select("removed_id").collect().map(_.getLong(0)).toSet
    assert(log == Set(1L))

    // chain GC: with grace elapsed (mtimes aged manually), retain=1
    // keeps only the marked head; markers survive; the index still
    // loads and a NEW batch continues the chain
    Seq("v1", "v2").foreach(v => Files.setLastModifiedTime(
      Paths.get(indexDir, v),
      java.nio.file.attribute.FileTime.fromMillis(1L)))
    val gone = DocStream.vacuumIndexVersions(indexDir, retain = 1,
      graceMs = 1000L)
    assert(gone == Seq("v1", "v2"), s"got $gone")
    assert(Files.exists(Paths.get(indexDir, "v3")))
    assert(Files.exists(Paths.get(indexDir, "done-adds-1")))
    addSink(Seq((99L, "yet another unseen document text"))
      .toDF("doc_id", "text"), 2L)
    assert(Files.readString(Paths.get(indexDir, "done-adds-2"))
      .trim.toLong == 4L, "chain did not continue after GC")
    graft.engine.Caches.drain(spark)
  }
}
