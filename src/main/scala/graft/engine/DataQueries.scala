package graft.engine

import graft.operators.{Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data-pipeline operators (dedup, similarity search, text
  * analysis) over the driver's `documents` / `embeddings` tables,
  * each mirrored by a value-exact DuckDB oracle.
  */
object DataQueries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** DuckDB polynomial for hex→decimal of the first 15 md5 digits —
    * mirrors Spark's `conv(substring(md5(x),1,15),16,10)`. */
  private def hex2dec(hexExpr: String): String =
    (1 to 15).map(i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1))-1)*${BigInt(16).pow(15 - i)}")
      .mkString("(", " + ", ")")

  // ---- exact dedup ----
  def dedupExact(spark: SparkSession, sf: String): DataFrame =
    TextOps.exactDedupSummary(t(spark, sf, "documents"), "lang", "text")

  val dedupExactSql: String = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
FROM documents GROUP BY 1"""

  // ---- n-gram Jaccard near-dup ----
  def ngramJaccard(spark: SparkSession, sf: String): DataFrame =
    TextOps.jaccardPairs(t(spark, sf, "documents"), "doc_id", "text",
      n = 3, maxChars = 80, minJaccard = 0.62)

  val ngramJaccardSql: String = """
WITH sh AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, greatest(length(substring(text, 1, 80)) - 2, 1) + 1),
      i -> substring(substring(text, 1, 80), CAST(i AS INT), 3))) AS s
  FROM documents
)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.62"""

  // ---- MinHash + LSH near-dedup ----
  val MinHashNum = 8
  val MinHashBands = 4
  val MinHashJaccard = 0.66

  // ---- winnowing fingerprints (SWA / MOSS) ----
  private val WinnowK = 8
  private val WinnowW = 6
  private val WinnowDocCap = 150 // bounds the oracle's gram cross join
  private val WinnowMinShared = 3
  private val WinnowMaxDf = 4

  /** Per-document winnowing-fingerprint summary: the count and the
    * sums over (fp, pos) pin every selected fingerprint value AND its
    * position — window-min selection, the rightmost-tie rule and the
    * gram hash all have to agree with the oracle for the sums to
    * match. */
  def winnowFps(spark: SparkSession, sf: String): DataFrame =
    TextOps.winnowFingerprints(
      t(spark, sf, "documents").where(col("doc_id") < WinnowDocCap),
      "doc_id", "text", WinnowK, WinnowW)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_fps"), sum("fp").as("sum_fp"),
        sum("pos").as("sum_pos"))
      .select(col("doc_id"), col("n_fps"), col("sum_fp"), col("sum_pos"))

  /** Shared winnowing-fingerprint grams CTE (positions via a constant
    * range + length filter — DuckDB's range() can't be lateral). */
  private def winnowSelCte: String = s"""
WITH d AS (
  -- positions come from a constant range (DuckDB range() can't be
  -- lateral); fail LOUDLY if a doc ever exceeds it rather than
  -- silently truncating the oracle's gram set
  SELECT doc_id,
    CASE WHEN len(text) > 100000
      THEN error('winnow oracle: document exceeds the position range')
      ELSE text END AS text
  FROM documents
  WHERE doc_id < $WinnowDocCap AND len(text) >= ${WinnowK + WinnowW - 1}
),
g AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
    (${hex2dec(s"md5(substr(text, CAST(i AS INT), $WinnowK))")})
      % ${TextOps.MinHashP} AS h,
    len(text) - $WinnowK + 1 AS n
  FROM d, range(1, 100001) r(i)
  WHERE i <= len(text) - $WinnowK + 1
),
wmin AS (
  SELECT g.doc_id, CAST(ws.i AS INT) AS win,
    min(struct_pack(h := g.h, negpos := -g.pos)) AS m
  FROM g, range(1, 100001) ws(i)
  WHERE g.pos >= ws.i AND g.pos < ws.i + $WinnowW
    AND ws.i <= g.n - $WinnowW + 1
  GROUP BY 1, 2
),
sel AS (SELECT DISTINCT doc_id, -m.negpos AS pos, m.h AS fp FROM wmin)"""

  val winnowFpsSql: String = s"""$winnowSelCte
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
  CAST(sum(fp) AS BIGINT) AS sum_fp,
  CAST(sum(pos) AS BIGINT) AS sum_pos
FROM sel GROUP BY doc_id"""

  /** Winnowing over ROLLING Rabin–Karp gram hashes (the gram-hash
    * scale path — no per-gram md5). Restricted to printable-ASCII
    * documents so the oracle's per-character ord() equals the
    * engine's UTF-8 byte. */
  def winnowRolling(spark: SparkSession, sf: String): DataFrame =
    TextOps.winnowFingerprintsRolling(
      t(spark, sf, "documents")
        // \A..\z (not ^..$): Java's $ also matches before a trailing
        // newline while RE2's does not — the oracle filter must be
        // the exact same predicate
        .where(col("doc_id") < WinnowDocCap &&
          col("text").rlike("\\A[ -~]*\\z")),
      "doc_id", "text", WinnowK, WinnowW)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_fps"), sum("fp").as("sum_fp"),
        sum("pos").as("sum_pos"))
      .select(col("doc_id"), col("n_fps"), col("sum_fp"), col("sum_pos"))

  /** Rolling-hash analogue of [[winnowSelCte]] (per-position Σ
    * polynomial instead of md5) — ONE definition shared by the
    * rolling fps and rolling pairs oracles. */
  private def winnowRollingSelCte: String = {
    val P = graft.functions.GramHashesImpl.P
    // h = Σ_j ord(c_{i+j})·B^{k−1−j} mod p, each term reduced before
    // the sum so nothing overflows BIGINT
    val terms = (0 until WinnowK).map { j =>
      val pw = graft.functions.GramHashesImpl.powB(WinnowK - 1 - j)
      s"(CAST(ord(substr(text, CAST(i AS INT) + $j, 1)) AS BIGINT) * ${pw}) % $P"
    }.mkString("(", " + ", s") % $P")
    s"""
WITH d AS (
  SELECT doc_id,
    CASE WHEN len(text) > 100000
      THEN error('winnow oracle: document exceeds the position range')
      ELSE text END AS text
  FROM documents
  WHERE doc_id < $WinnowDocCap AND len(text) >= ${WinnowK + WinnowW - 1}
    AND regexp_matches(text, '\\A[ -~]*\\z')
),
g AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
    $terms AS h,
    len(text) - $WinnowK + 1 AS n
  FROM d, range(1, 100001) r(i)
  WHERE i <= len(text) - $WinnowK + 1
),
wmin AS (
  SELECT g.doc_id, CAST(ws.i AS INT) AS win,
    min(struct_pack(h := g.h, negpos := -g.pos)) AS m
  FROM g, range(1, 100001) ws(i)
  WHERE g.pos >= ws.i AND g.pos < ws.i + $WinnowW
    AND ws.i <= g.n - $WinnowW + 1
  GROUP BY 1, 2
),
sel AS (SELECT DISTINCT doc_id, -m.negpos AS pos, m.h AS fp FROM wmin)"""
  }

  val winnowRollingSql: String = s"""$winnowRollingSelCte
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
  CAST(sum(fp) AS BIGINT) AS sum_fp,
  CAST(sum(pos) AS BIGINT) AS sum_pos
FROM sel GROUP BY doc_id"""

  /** The WHOLE winnowing dedup pipeline in its 100 TB shape: linear
    * rolling fingerprints + the doc-freq-capped pair join. */
  def winnowRollingPairs(spark: SparkSession, sf: String): DataFrame =
    TextOps.winnowNearDupPairsRolling(
      t(spark, sf, "documents")
        .where(col("doc_id") < WinnowDocCap &&
          col("text").rlike("\\A[ -~]*\\z")),
      "doc_id", "text", WinnowK, WinnowW,
      WinnowMinShared, WinnowMaxDf)
      .select(col("id_a"), col("id_b"), col("shared"))

  val winnowRollingPairsSql: String =
    s"""$winnowRollingSelCte$winnowPairsCte
SELECT id_a, id_b, shared FROM pairs"""

  /** MOSS-style near-dup pairs: ≥ minShared shared rare fingerprints
    * (doc-frequency ≤ maxDf). */
  def winnowPairs(spark: SparkSession, sf: String): DataFrame =
    TextOps.winnowNearDupPairs(
      t(spark, sf, "documents").where(col("doc_id") < WinnowDocCap),
      "doc_id", "text", WinnowK, WinnowW,
      WinnowMinShared, WinnowMaxDf)
      .select(col("id_a"), col("id_b"), col("shared"))

  /** Winnow near-dup pair CTEs layered on [[winnowSelCte]] — ONE
    * definition shared by the pairs and components oracles so the
    * two can never silently diverge. */
  private def winnowPairsCte: String = s""",
docfp AS (SELECT DISTINCT doc_id, fp FROM sel),
rare AS (SELECT fp FROM docfp GROUP BY fp
         HAVING count(*) <= $WinnowMaxDf),
kept AS (SELECT * FROM docfp WHERE fp IN (SELECT fp FROM rare)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CAST(count(*) AS BIGINT) AS shared
  FROM kept a JOIN kept b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared
)"""

  val winnowPairsSql: String =
    s"""$winnowSelCte$winnowPairsCte
SELECT id_a, id_b, shared FROM pairs"""

  /** Dedup CLUSTERING over the winnowing near-dup pairs: connected
    * components by hash-min label propagation, canonical = the
    * component's minimum doc id. The oracle recomputes components via
    * a recursive reachability CTE — completely different algorithm,
    * same fixpoint. */
  def dedupComponents(spark: SparkSession, sf: String): DataFrame = {
    val docs = t(spark, sf, "documents")
      .where(col("doc_id") < WinnowDocCap)
    val pairs = TextOps.winnowNearDupPairs(docs, "doc_id", "text",
      WinnowK, WinnowW, WinnowMinShared, WinnowMaxDf)
    graft.operators.Dedup.dedupClusters(
      docs.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("comp"), col("is_canonical"))
  }

  val dedupComponentsSql: String =
    winnowSelCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      winnowPairsCte + s""",
e AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS (SELECT doc_id AS id FROM documents
          WHERE doc_id < $WinnowDocCap),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT reach.id, e.b AS r FROM reach JOIN e ON e.a = reach.r
)
SELECT n.id AS doc_id, c.comp, (n.id = c.comp) AS is_canonical
FROM nodes n
JOIN (SELECT id, min(r) AS comp FROM reach GROUP BY id) c
  ON c.id = n.id"""

  def minhashLsh(spark: SparkSession, sf: String): DataFrame =
    TextOps.minhashDedup(t(spark, sf, "documents"), "doc_id", "text",
      MinHashNum, MinHashBands, MinHashJaccard)

  val minhashLshSql: String = {
    val sigCols = (0 until MinHashNum).map(k =>
      s"min((hm*${TextOps.minhashA(k)}+${TextOps.minhashB(k)})%${TextOps.MinHashP}) AS sig$k")
      .mkString(",\n    ")
    val rows = MinHashNum / MinHashBands
    val bandSelects = (0 until MinHashBands).map { b =>
      val sigs = (0 until rows).map(r => s"sig${b * rows + r}").mkString(", ")
      s"SELECT id, concat_ws('_', $b, $sigs) AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""
WITH toks AS (
  SELECT doc_id AS id,
    unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
  FROM documents
),
h AS (SELECT id, tok, (${hex2dec("md5(tok)")} % ${TextOps.MinHashP}) AS hm
  FROM toks),
sig AS (SELECT id,
    $sigCols
  FROM h GROUP BY id),
bands AS (
  $bandSelects
),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.id < b.id),
sizes AS (SELECT id, CAST(count(DISTINCT tok) AS BIGINT) AS n
  FROM toks GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN h ta ON ta.id = c.id_a
  JOIN h tb ON tb.id = c.id_b AND tb.tok = ta.tok
  GROUP BY c.id_a, c.id_b)
SELECT * FROM (
  SELECT c.id_a, c.id_b,
    CAST(COALESCE(i.i, 0) AS DOUBLE) /
      CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.id = c.id_a
  JOIN sizes sb ON sb.id = c.id_b
) WHERE jaccard >= $MinHashJaccard"""
  }

  /** Incremental near-dedup: the corpus is docs with doc_id % 5 != 4
    * (indexed once via [[TextOps.minhashIndex]]); the "daily batch"
    * is the % 5 == 4 docs. The incremental result must equal the
    * FULL-corpus LSH dedup filtered to pairs touching the batch —
    * which is exactly what the oracle computes (the q_minhash_lsh SQL
    * plus the batch-membership predicate), so the equivalence
    * [[TextOps.minhashDedupIncremental]] promises is oracle-pinned,
    * including the subtle gained-group case (a batch doc exactly
    * duplicating corpus content inherits that group's neighborhood). */
  def minhashIncr(spark: SparkSession, sf: String): DataFrame = {
    val docs = t(spark, sf, "documents")
    val corpus = docs.where(col("doc_id") % 5 =!= 4)
    val batch = docs.where(col("doc_id") % 5 === 4)
    val idx = TextOps.minhashIndex(corpus, "doc_id", "text",
      MinHashNum, MinHashBands)
    TextOps.minhashDedupIncremental(idx, batch, "doc_id", "text",
      MinHashJaccard)
  }

  val minhashIncrSql: String =
    minhashLshSql + " AND (id_a % 5 = 4 OR id_b % 5 = 4)"

  /** Takedown-aware incremental near-dedup: the % 5 != 4 corpus is
    * indexed, a takedown removes its % 7 == 3 docs from the INDEX
    * ([[TextOps.minhashIndexRemove]] — rep promotion and emptied-group
    * cleanup included), and the % 5 == 4 batch dedups against the
    * reduced index. Must equal full LSH dedup over (corpus minus
    * takedown) ∪ batch filtered to batch-touching pairs — the oracle
    * recomputes exactly that from the filtered documents table, so
    * the remove-equals-rebuild promise is DuckDB-pinned, not just
    * spec-pinned. */
  def minhashTakedown(spark: SparkSession, sf: String): DataFrame = {
    val docs = t(spark, sf, "documents")
    val corpus = docs.where(col("doc_id") % 5 =!= 4)
    val batch = docs.where(col("doc_id") % 5 === 4)
    val removed = corpus.where(col("doc_id") % 7 === 3).select("doc_id")
    val idx = TextOps.minhashIndexRemove(
      TextOps.minhashIndex(corpus, "doc_id", "text",
        MinHashNum, MinHashBands),
      removed, "doc_id")
    TextOps.minhashDedupIncremental(idx, batch, "doc_id", "text",
      MinHashJaccard)
  }

  val minhashTakedownSql: String =
    minhashLshSql.replace("FROM documents",
      "FROM documents WHERE NOT (doc_id % 5 <> 4 AND doc_id % 7 = 3)") +
      " AND (id_a % 5 = 4 OR id_b % 5 = 4)"

  // ---- per-row signature groups (streaming-collapse key, batch-checked) ----

  /** Signature GROUPS over the corpus using the PER-ROW signature
    * (`TextOps.withMinhashSignature` — the streaming dedup key):
    * one row per distinct full signature with its doc count and
    * canonical (min) doc id. Oracle-pins the per-row signature values
    * against DuckDB's aggregate recomputation, complementing the
    * ScalaTest that pins per-row ≡ batch-aggregate. */
  def sigGroups(spark: SparkSession, sf: String): DataFrame = {
    val sigKey = concat_ws("_",
      (0 until MinHashNum).map(k => col(s"sig$k")): _*)
    // null-text docs have NULL sig columns; concat_ws would skip them
    // and give every such doc sig_key "" — while the oracle's unnest
    // over a null token array drops those docs entirely. Filter them
    // here so engine and oracle agree if the fixture ever gains nulls.
    TextOps.withMinhashSignature(
      t(spark, sf, "documents").select("doc_id", "text")
        .where(col("text").isNotNull),
      "text", MinHashNum)
      .select(col("doc_id"), sigKey.as("sig_key"))
      .groupBy("sig_key")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical"))
  }

  val sigGroupsSql: String = {
    val sigCols = (0 until MinHashNum).map(k =>
      s"min((hm*${TextOps.minhashA(k)}+${TextOps.minhashB(k)})%${TextOps.MinHashP}) AS sig$k")
      .mkString(",\n    ")
    val keyCols = (0 until MinHashNum).map(k => s"sig$k").mkString(", ")
    s"""
WITH toks AS (
  SELECT doc_id AS id,
    unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
  FROM documents
),
h AS (SELECT id, tok, (${hex2dec("md5(tok)")} % ${TextOps.MinHashP}) AS hm
  FROM toks),
sig AS (SELECT id, $sigCols FROM h GROUP BY id)
SELECT concat_ws('_', $keyCols) AS sig_key,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(id) AS BIGINT) AS canonical
FROM sig GROUP BY 1"""
  }

  // ---- streaming signature dedup, batch-replay-checked ----

  /** Streaming signature-dedup survivors over the documents corpus,
    * driven through [[graft.streaming.DocStream.signatureDedupStream]]
    * as a DETERMINISTIC micro-batch replay: the rn-th occurrence of
    * each signature (rn = row_number by doc_id within the signature
    * group) lands in micro-batch rn, so no two same-key docs ever
    * share a batch and the survivor set is pinned by batch order
    * alone — the first-arriving (min doc_id) doc of every signature
    * group survives, which is exactly what the DuckDB oracle
    * recomputes from the corpus. This puts the streaming operator
    * under the house oracle, not just ScalaTest: if the stream ever
    * dropped a first occurrence, passed a repeat, or mangled the
    * per-row signature, the survivor set diverges.
    *
    * Batch count is capped at 8: determinism only needs each group's
    * FIRST occurrence isolated in an earlier batch than the rest —
    * every rn ≥ 2 doc is dropped against state already planted by
    * batch 1, so later occurrences may share batches freely (without
    * the cap the replay runs one micro-batch per max-group-size:
    * ~300 batches ≈ 45 s of scheduling for identical semantics).
    *
    * Harness-scale by nature (the corpus is collected to feed the
    * MemoryStream) — the production path is a real source feeding the
    * same operator; state is one key per watermark horizon. The
    * watermark delay is DERIVED from the corpus (max doc_id seconds
    * + 1 h slack), so by construction it exceeds the total event-time
    * span at every scale factor: no key is evicted mid-replay and no
    * row is late — arrival order is the only semantics under test.
    * (A fixed "1 hour" was wrong: sf0.1's 5 000-doc span is already
    * 83 min, and a span over 2× the delay would evict a first
    * occurrence's state and let a later duplicate survive — a false
    * oracle red caused by the fixture outgrowing the constant.) */
  def streamSigDedup(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val sigKey = concat_ws("_",
      (0 until MinHashNum).map(k => col(s"sig$k")): _*)
    val staged = TextOps.withMinhashSignature(
      t(spark, sf, "documents").select("doc_id", "text")
        .where(col("text").isNotNull), "text", MinHashNum)
      .select(col("doc_id"), col("text"), sigKey.as("sig_key"))
      .withColumn("rn", row_number().over(org.apache.spark.sql
        .expressions.Window.partitionBy("sig_key").orderBy("doc_id")))
      .select("doc_id", "text", "rn")
    val rows = staged.collect()
      .map(r => (r.getLong(0), r.getString(1), math.min(r.getInt(2), 8)))
    val byBatch = rows
      .groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (rn, xs) => rn -> xs.sortBy(_._1) }
    // delay > span(event time) ⇒ nothing late, no state evicted
    val delaySecs = rows.iterator.map(_._1).foldLeft(0L)(math.max) + 3600L
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docsDf = input.toDF().toDF("doc_id", "text", "event_time")
    val out = graft.streaming.DocStream.signatureDedupStream(
      docsDf, "doc_id", "text", MinHashNum, s"$delaySecs seconds")
    // unique sink name per invocation: the memory sink registers a
    // session temp view, and a warm rep must not collide with it
    val qname = "sig_dedup_replay_" +
      java.util.UUID.randomUUID().toString.take(8)
    val query = out.writeStream.format("memory").queryName(qname)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      byBatch.foreach { case (_, docs) =>
        input.addData(docs.map { case (id, text, _) =>
          (id, text, new java.sql.Timestamp(t0 + id * 1000L)) })
        query.processAllAvailable()
      }
      val survivors = spark.table(qname)
        .select("doc_id", "sig_key").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      // re-materialize locally so the returned frame outlives the sink
      survivors.toDF("doc_id", "sig_key")
    } finally {
      query.stop()
      spark.catalog.dropTempView(qname)
      ()
    }
  }

  val streamSigDedupSql: String = {
    val sigCols = (0 until MinHashNum).map(k =>
      s"min((hm*${TextOps.minhashA(k)}+${TextOps.minhashB(k)})%${TextOps.MinHashP}) AS sig$k")
      .mkString(",\n    ")
    val keyCols = (0 until MinHashNum).map(k => s"sig$k").mkString(", ")
    s"""
WITH toks AS (
  SELECT doc_id AS id,
    unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
  FROM documents
),
h AS (SELECT id, tok, (${hex2dec("md5(tok)")} % ${TextOps.MinHashP}) AS hm
  FROM toks),
sig AS (SELECT id, $sigCols FROM h GROUP BY id)
SELECT CAST(min(id) AS BIGINT) AS doc_id,
  concat_ws('_', $keyCols) AS sig_key
FROM sig GROUP BY $keyCols"""
  }

  // ---- MinHash dedup clusters over a hot-bucket fixture ----

  private val MinHashClusterJ = 0.5
  private val MinHashClusterCap = 16

  /** Deterministic hot-bucket fixture: a 10³-copy exact-duplicate
    * cluster (the boilerplate class that makes un-guarded LSH band
    * joins quadratic), 5 near-dup variants × 10 copies, and 100
    * unique singletons — 1150 docs, 106 distinct contents. */
  def clusterDocs(spark: SparkSession): DataFrame =
    spark.range(0, 1150).select(col("id").as("doc_id"),
      when(col("id") < 1000, lit("alpha beta gamma delta epsilon zeta"))
        .when(col("id") < 1050,
          concat(lit("alpha beta gamma delta epsilon var"),
            (col("id") % 5).cast("string")))
        .otherwise(format_string(
          "unique%d lorem%d ipsum%d dolor%d sit%d amet%d",
          col("id"), col("id"), col("id"), col("id"), col("id"),
          col("id"))).as("text"))

  /** Corpus-scale dedup clustering over the hot-bucket fixture:
    * exact-content collapse → banded rep candidates (per-bucket cap)
    * → Jaccard verify → connected components → members inherit. The
    * candidate join sees 106 representatives, never the 10³-cluster's
    * ~5·10⁵ pairs (TextOpsSpec pins the candidate count). */
  def minhashClusters(spark: SparkSession, sf: String): DataFrame =
    TextOps.minhashDedupClusters(clusterDocs(spark), "doc_id", "text",
      MinHashNum, MinHashBands, MinHashClusterJ, MinHashClusterCap)
      .select(col("id").as("doc_id"), col("comp"), col("is_canonical"))

  val minhashClustersSql: String = {
    val sigCols = (0 until MinHashNum).map(k =>
      s"min((hm*${TextOps.minhashA(k)}+${TextOps.minhashB(k)})%${TextOps.MinHashP}) AS sig$k")
      .mkString(",\n    ")
    val rows = MinHashNum / MinHashBands
    val bandSelects = (0 until MinHashBands).map { b =>
      val sigs = (0 until rows).map(r => s"sig${b * rows + r}").mkString(", ")
      s"SELECT id, concat_ws('_', $b, $sigs) AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""
WITH RECURSIVE docs AS (
  SELECT CAST(d AS BIGINT) AS doc_id,
    CASE WHEN d < 1000 THEN 'alpha beta gamma delta epsilon zeta'
         WHEN d < 1050 THEN 'alpha beta gamma delta epsilon var'
           || CAST(d % 5 AS VARCHAR)
         ELSE printf('unique%d lorem%d ipsum%d dolor%d sit%d amet%d',
           d, d, d, d, d, d)
    END AS text
  FROM range(0, 1150) t(d)
),
keyed AS (
  SELECT doc_id, array_to_string(list_sort(list_distinct(
    regexp_split_to_array(trim(text), '\\s+'))), ' ') AS ckey
  FROM docs
),
grp AS (SELECT ckey, min(doc_id) AS rid FROM keyed GROUP BY 1),
members AS (SELECT k.doc_id AS id, g.rid
  FROM keyed k JOIN grp g USING (ckey)),
reps AS (SELECT d.doc_id AS id, d.text FROM docs d
  JOIN members m ON m.id = d.doc_id AND m.rid = d.doc_id),
toks AS (SELECT id, unnest(list_distinct(
    regexp_split_to_array(trim(text), '\\s+'))) AS tok FROM reps),
h AS (SELECT id, tok, (${hex2dec("md5(tok)")} % ${TextOps.MinHashP}) AS hm
  FROM toks),
sig AS (SELECT id,
    $sigCols
  FROM h GROUP BY id),
bands AS (
  $bandSelects
),
okbands AS (SELECT band_key FROM bands GROUP BY 1
  HAVING count(*) <= $MinHashClusterCap),
kept AS (SELECT b.* FROM bands b JOIN okbands USING (band_key)),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM kept a JOIN kept b ON a.band_key = b.band_key AND a.id < b.id),
sizes AS (SELECT id, CAST(count(DISTINCT tok) AS BIGINT) AS n
  FROM toks GROUP BY 1),
inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
  FROM cand c JOIN h ta ON ta.id = c.id_a
  JOIN h tb ON tb.id = c.id_b AND tb.tok = ta.tok
  GROUP BY 1, 2),
edges AS (
  SELECT id_a, id_b FROM (
    SELECT c.id_a, c.id_b,
      CAST(COALESCE(i.i, 0) AS DOUBLE) /
        CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE) AS j
    FROM cand c
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    JOIN sizes sa ON sa.id = c.id_a
    JOIN sizes sb ON sb.id = c.id_b
  ) WHERE j >= $MinHashClusterJ
),
e AS (SELECT id_a AS a, id_b AS b FROM edges
  UNION ALL SELECT id_b, id_a FROM edges),
rnodes AS (SELECT DISTINCT rid AS id FROM members),
reach AS (
  SELECT id, id AS r FROM rnodes
  UNION
  SELECT reach.id, e.b AS r FROM reach JOIN e ON e.a = reach.r
),
comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY 1)
SELECT m.id AS doc_id, c.comp, (m.id = c.comp) AS is_canonical
FROM members m JOIN comp c ON c.id = m.rid"""
  }

  // ---- SimHash (16-bit, md5-derived, SQL-replicable) ----
  def simhash16(spark: SparkSession, sf: String): DataFrame = {
    val hashes = TextOps.tokenHashes(t(spark, sf, "documents"),
      "doc_id", "text")
    TextOps.simhash(hashes, 16)
  }

  val simhash16Sql: String = {
    val bitSums = (0 until 16).map(b =>
      s"SUM(CASE WHEN (hm // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS bs$b")
      .mkString(",\n    ")
    val combine = (0 until 16).map(b =>
      s"(CASE WHEN bs$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""
WITH toks AS (
  SELECT doc_id AS id,
    unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
  FROM documents
),
h AS (SELECT id, (${hex2dec("md5(tok)")} % ${TextOps.MinHashP}) AS hm
  FROM toks),
s AS (SELECT id,
    $bitSums
  FROM h GROUP BY id)
SELECT id, CAST($combine AS BIGINT) AS simhash FROM s"""
  }

  // ---- token counting ----
  def tokenStats(spark: SparkSession, sf: String): DataFrame = {
    val d = TextOps.tokenCounts(t(spark, sf, "documents"), col("text"))
    d.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens").cast("long")).as("total_tokens"),
      max(col("n_tokens")).as("max_tokens"),
      sum(col("n_distinct_tokens").cast("long")).as("total_distinct"))
  }

  val tokenStatsSql: String = """
WITH d AS (
  SELECT lang,
    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
    len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(MAX(n_tokens) AS INT) AS max_tokens,
  CAST(SUM(n_distinct) AS BIGINT) AS total_distinct
FROM d GROUP BY 1"""

  // ---- BPE-ish regex token counting ----
  def tokenBpe(spark: SparkSession, sf: String): DataFrame =
    t(spark, sf, "documents")
      .select(col("lang"),
        size(TextOps.bpeishTokens(col("text"))).as("n"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n").cast("long")).as("total_bpeish"),
        max(col("n")).as("max_bpeish"))

  val tokenBpeSql: String = {
    val pat = TextOps.BpeishPattern.replace("'", "''")
    s"""
WITH d AS (
  SELECT lang, len(regexp_extract_all(text, '$pat')) AS n
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n) AS BIGINT) AS total_bpeish,
  CAST(MAX(n) AS INT) AS max_bpeish
FROM d GROUP BY 1"""
  }

  // ---- quality scoring (per-doc, no cross-row double sums) ----
  def qualityScores(spark: SparkSession, sf: String): DataFrame =
    TextOps.qualityScore(t(spark, sf, "documents"), col("text"))
      .select("doc_id", "lang", "n_chars_m", "n_tokens", "punct_ratio",
        "space_ratio", "mean_token_len")

  val qualityScoresSql: String = """
SELECT doc_id, lang,
  CAST(length(text) AS BIGINT) AS n_chars_m,
  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
    AS DOUBLE) / length(text) AS punct_ratio,
  CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
    / length(text) AS space_ratio,
  CAST(length(replace(text, ' ', '')) AS DOUBLE)
    / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len
FROM documents"""

  // ---- repetition signals (Gopher/MassiveText filters) ----

  /** Deterministic fixture with REAL line structure (the corpus
    * documents are single-line, so duplicate-line metrics would be
    * uniformly zero over them): duplicated-line blocks of varying
    * size, all-unique docs, half-duplicated docs, single-line docs. */
  def repetitionDocs(spark: SparkSession): DataFrame = {
    val d = col("doc_id")
    spark.range(0, 120).select(col("id").as("doc_id"))
      .select(d,
        when(d % 4 === 0,
          concat(
            concat_ws("\n", array_repeat(lit("dup dup dup"),
              ((d % 5) + 2).cast("int"))),
            lit("\n"), format_string("tail %d", d)))
          .when(d % 4 === 1, concat_ws("\n",
            format_string("u%d one", d), format_string("u%d two", d),
            format_string("u%d three", d)))
          .when(d % 4 === 2, concat_ws("\n",
            format_string("pair %d", d % 3),
            format_string("pair %d", d % 3),
            format_string("solo %d", d)))
          .otherwise(format_string("single %d", d)).as("text"))
  }

  /** DuckDB mirror of [[repetitionDocs]] (byte-identical text). */
  private val repetitionDocsCte: String = """
docs AS (
  SELECT CAST(d AS BIGINT) AS doc_id,
    CASE WHEN d % 4 = 0 THEN
        rtrim(repeat('dup dup dup' || chr(10), CAST(d % 5 AS INT) + 2),
          chr(10)) || chr(10) || printf('tail %d', d)
      WHEN d % 4 = 1 THEN printf('u%d one', d) || chr(10) ||
        printf('u%d two', d) || chr(10) || printf('u%d three', d)
      WHEN d % 4 = 2 THEN printf('pair %d', d % 3) || chr(10) ||
        printf('pair %d', d % 3) || chr(10) || printf('solo %d', d)
      ELSE printf('single %d', d) END AS text
  FROM range(0, 120) t(d)
)"""

  def dupLines(spark: SparkSession, sf: String): DataFrame =
    TextOps.dupLineSignals(repetitionDocs(spark), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_lines"),
        col("dup_line_frac"), col("dup_line_char_frac"))

  val dupLinesSql: String = s"""
WITH $repetitionDocsCte,
lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM docs),
g AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
  CASE WHEN sum(c) > 0
    THEN CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
      / CAST(sum(c) AS DOUBLE) ELSE 0.0 END AS dup_line_frac,
  CASE WHEN sum(c * length(line)) > 0
    THEN CAST(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)
        AS DOUBLE)
      / CAST(sum(c * length(line)) AS DOUBLE)
    ELSE 0.0 END AS dup_line_char_frac
FROM g GROUP BY doc_id"""

  def topNgrams(spark: SparkSession, sf: String): DataFrame =
    TextOps.topNgramSignals(t(spark, sf, "documents"), "doc_id", "text",
      Seq(2, 3))
      .select(col("id").as("doc_id"), col("top2_char_frac"),
        col("top3_char_frac"))

  val topNgramsSql: String = """
WITH toks AS (SELECT doc_id,
    regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
base AS (SELECT doc_id, t, length(array_to_string(t, '')) AS wc
  FROM toks),
g2 AS (SELECT doc_id, wc, unnest(list_transform(range(1, len(t)),
    i -> t[i] || ' ' || t[i+1])) AS g FROM base
  WHERE len(t) >= 2 AND wc > 0),
c2 AS (SELECT doc_id, g, any_value(wc) AS wc, count(*) AS c
  FROM g2 GROUP BY 1, 2),
r2 AS (SELECT doc_id,
    CAST(c * length(replace(g, ' ', '')) AS DOUBLE) / CAST(wc AS DOUBLE)
      AS f,
    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
  FROM c2),
g3 AS (SELECT doc_id, wc, unnest(list_transform(range(1, len(t) - 1),
    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM base
  WHERE len(t) >= 3 AND wc > 0),
c3 AS (SELECT doc_id, g, any_value(wc) AS wc, count(*) AS c
  FROM g3 GROUP BY 1, 2),
r3 AS (SELECT doc_id,
    CAST(c * length(replace(g, ' ', '')) AS DOUBLE) / CAST(wc AS DOUBLE)
      AS f,
    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
  FROM c3)
SELECT d.doc_id, COALESCE(r2.f, 0.0) AS top2_char_frac,
  COALESCE(r3.f, 0.0) AS top3_char_frac
FROM documents d
LEFT JOIN (SELECT doc_id, f FROM r2 WHERE rn = 1) r2 USING (doc_id)
LEFT JOIN (SELECT doc_id, f FROM r3 WHERE rn = 1) r3 USING (doc_id)"""

  // ---- PII scrub + URL/domain stats over a web-metadata fixture ----

  /** Deterministic web-corpus fixture (the driver tables carry no
    * URLs or contact info): per-doc URL over ~51 hosts, text rows
    * cycling email / phone / clean / email+phone shapes. */
  def webDocs(spark: SparkSession): DataFrame = {
    val d = col("doc_id")
    spark.range(0, 200).select(col("id").as("doc_id"))
      .select(d,
        format_string("https://%s.site%d.example/p/%d",
          when(d % 3 === 0, lit("www")).when(d % 3 === 1, lit("blog"))
            .otherwise(lit("shop")), d % 17, d).as("url"),
        when(d % 4 === 0,
          format_string("reach user%d at person%d@mail%d.org today",
            d, d, d % 5))
          .when(d % 4 === 1,
            format_string("call +1-555-%d for offer %d",
              d % 9000 + 1000, d))
          .when(d % 4 === 2,
            format_string("plain note %d with no contact info", d))
          .otherwise(format_string(
            "double hit a%d@b%d.io and +44-202-%d end",
            d, d % 7, d % 900 + 100)).as("text"))
  }

  /** DuckDB mirror of [[webDocs]] (byte-identical rows). */
  private val webDocsCte: String = """
webdocs AS (
  SELECT CAST(d AS BIGINT) AS doc_id,
    printf('https://%s.site%d.example/p/%d',
      CASE WHEN d % 3 = 0 THEN 'www' WHEN d % 3 = 1 THEN 'blog'
        ELSE 'shop' END, d % 17, d) AS url,
    CASE WHEN d % 4 = 0 THEN
        printf('reach user%d at person%d@mail%d.org today', d, d, d % 5)
      WHEN d % 4 = 1 THEN
        printf('call +1-555-%d for offer %d', d % 9000 + 1000, d)
      WHEN d % 4 = 2 THEN
        printf('plain note %d with no contact info', d)
      ELSE printf('double hit a%d@b%d.io and +44-202-%d end',
        d, d % 7, d % 900 + 100)
    END AS text
  FROM range(0, 200) t(d)
)"""

  def piiRedact(spark: SparkSession, sf: String): DataFrame =
    TextOps.redactPii(webDocs(spark), "text")
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("text_redacted")).as("redacted_md5"))

  val piiRedactSql: String = s"""
WITH $webDocsCte
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '${TextOps.EmailPattern}'))
    AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '${TextOps.PhonePattern}'))
    AS BIGINT) AS n_phones,
  md5(regexp_replace(
    regexp_replace(text, '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
    '${TextOps.PhonePattern}', '<PHONE>', 'g')) AS redacted_md5
FROM webdocs"""

  def urlDomains(spark: SparkSession, sf: String): DataFrame =
    webDocs(spark)
      .select(TextOps.urlHost(col("url")).as("host"), col("url"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("url").as("n_urls"))

  val urlDomainsSql: String = s"""
WITH $webDocsCte
SELECT regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)
    AS host,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT url) AS BIGINT) AS n_urls
FROM webdocs GROUP BY 1"""

  // ---- language ID (n-gram/stopword heuristic) ----
  def langId(spark: SparkSession, sf: String): DataFrame =
    TextOps.langId(t(spark, sf, "documents"), col("doc_id"), col("text"))

  val langIdSql: String = {
    val markerValues = TextOps.langMarkers.flatMap { case (l, ws) =>
      ws.map(w => s"('$l', '$w')")
    }.mkString(", ")
    s"""
WITH markers(cand_lang, marker) AS (VALUES $markerValues),
toks AS (
  SELECT doc_id AS id,
    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
total AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY id),
hits AS (
  SELECT t.id, m.cand_lang, CAST(count(*) AS BIGINT) AS n_hit
  FROM toks t JOIN markers m ON t.tok = m.marker
  GROUP BY t.id, m.cand_lang
),
scored AS (
  SELECT total.id, hits.cand_lang,
    CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / total.n_tok AS score
  FROM total LEFT JOIN hits ON total.id = hits.id
)
SELECT id, cand_lang AS pred_lang, score FROM (
  SELECT id, cand_lang, score,
    row_number() OVER (PARTITION BY id
      ORDER BY score DESC, cand_lang ASC) AS rn
  FROM scored
) WHERE rn = 1"""
  }

  // ---- embedding cosine top-k (brute-force exact ANN baseline) ----
  def embedTopK(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    Similarity.cosineTopK(e, e.where(col("vec_id") < 5), "vec_id",
      "embedding", k = 3)
  }

  val embedTopKSql: String = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
    (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
     FROM (SELECT unnest(q.embedding) AS x, unnest(c.embedding) AS y)) /
    (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       FROM (SELECT unnest(q.embedding) AS x))) *
     sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
       FROM (SELECT unnest(c.embedding) AS y)))) AS score
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
)
SELECT query_id, cand_id, CAST(rank AS INT) AS rank, score FROM (
  SELECT query_id, cand_id, score,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, cand_id ASC) AS rank
  FROM scored
) WHERE rank <= 3"""

  // ---- embedding cosine near-dup pairs ----
  def embedNearDup(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings").where(col("vec_id") < 150)
    Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.3)
  }

  val embedNearDupSql: String = """
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
     FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y)) /
    (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       FROM (SELECT unnest(a.embedding) AS x))) *
     sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
       FROM (SELECT unnest(b.embedding) AS y)))) AS score
  FROM embeddings a, embeddings b
  WHERE a.vec_id < 150 AND b.vec_id < 150 AND a.vec_id < b.vec_id
) WHERE score >= 0.3"""

  // ---- SRP-bucketed ANN (scale path) ----
  private val SrpDim = 64
  private val SrpPlanes = 10
  private val SrpThreshold = 0.25

  def srpNearDup(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    Similarity.srpNearDupPairs(e, "vec_id", "embedding", SrpDim,
      SrpPlanes, SrpThreshold)
  }

  /** Shared oracle prologue: SRP bucket per vector, replicating
    * [[Similarity.planeComponent]]'s integer-lattice hyperplanes in
    * plain SQL (embedding[d]·coeff summed over d, sign bit per
    * plane). */
  private def srpBucketSql: String = s"""
pr AS (
  SELECT e.vec_id, p.p,
    SUM(CAST(e.embedding[CAST(d.i + 1 AS INT)] AS DOUBLE) *
        ((CAST((1 + p.p * 7919 + d.i * 104729) % 1000003 AS DOUBLE)
          / 500001.5) - 1.0)) AS proj
  FROM embeddings e, range(0, $SrpPlanes) p(p), range(0, $SrpDim) d(i)
  GROUP BY 1, 2
),
bk AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN proj > 0
      THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS BIGINT)
      AS bucket
  FROM pr GROUP BY 1
)"""

  private def srpPairSql(bucketCond: String): String = s"""
WITH $srpBucketSql
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
     FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y)) /
    (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       FROM (SELECT unnest(a.embedding) AS x))) *
     sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
       FROM (SELECT unnest(b.embedding) AS y)))) AS score
  FROM embeddings a, embeddings b, bk ba, bk bb
  WHERE a.vec_id < b.vec_id
    AND ba.vec_id = a.vec_id AND bb.vec_id = b.vec_id
    AND $bucketCond
) WHERE score >= $SrpThreshold"""

  val srpNearDupSql: String = srpPairSql("ba.bucket = bb.bucket")

  /** Incremental embedding dedup: corpus = vec_id % 5 != 4 (indexed
    * once via [[Similarity.srpIndex]]), batch = the % 5 == 4 vectors;
    * the result must equal the FULL single-probe SRP dedup filtered
    * to batch-touching pairs — the oracle is [[srpNearDupSql]]'s body
    * plus that predicate (the q_minhash_incr pattern on the embedding
    * modality). */
  def srpIncr(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    val idx = Similarity.srpIndex(e.where(col("vec_id") % 5 =!= 4),
      "vec_id", "embedding", SrpDim, SrpPlanes)
    Similarity.srpNearDupIncremental(idx,
      e.where(col("vec_id") % 5 === 4), "vec_id", "embedding",
      SrpThreshold)
  }

  val srpIncrSql: String =
    srpPairSql("ba.bucket = bb.bucket") +
      " AND (id_a % 5 = 4 OR id_b % 5 = 4)"

  /** Embedding takedown (the q_minhash_takedown pattern on the SRP
    * modality): the % 5 != 4 corpus is indexed, its % 7 == 3 vectors
    * are removed from the INDEX ([[Similarity.srpIndexRemove]]), the
    * % 5 == 4 batch dedups against the reduced index; must equal full
    * SRP dedup over (corpus minus takedown) ∪ batch filtered to
    * batch-touching pairs — the oracle recomputes that over the
    * filtered embeddings table. */
  def srpTakedown(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    val corpus = e.where(col("vec_id") % 5 =!= 4)
    val idx = Similarity.srpIndexRemove(
      Similarity.srpIndex(corpus, "vec_id", "embedding", SrpDim,
        SrpPlanes),
      corpus.where(col("vec_id") % 7 === 3).select("vec_id"), "vec_id")
    Similarity.srpNearDupIncremental(idx,
      e.where(col("vec_id") % 5 === 4), "vec_id", "embedding",
      SrpThreshold)
  }

  val srpTakedownSql: String = {
    // every read site (bucket CTE + both pair sides) must see the
    // reduced table, so the whole statement re-roots on one filtered
    // CTE — "emb" replaces "embeddings" globally, then the original
    // WITH folds in behind it
    val body = (srpPairSql("ba.bucket = bb.bucket") +
      " AND (id_a % 5 = 4 OR id_b % 5 = 4)")
      .replace("embeddings", "emb")
      .replaceFirst("\\s*WITH ", "")
    s"""
WITH emb AS (SELECT * FROM embeddings
  WHERE NOT (vec_id % 5 <> 4 AND vec_id % 7 = 3)),
$body"""
  }

  /** Multi-probe SRP: Hamming-1 bucket probes for recall — candidate
    * pairs are exactly those whose buckets differ in at most one bit,
    * which the oracle states directly via bit_count(xor(...)). */
  def srpMultiProbe(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    Similarity.srpNearDupPairsMultiProbe(e, "vec_id", "embedding",
      SrpDim, SrpPlanes, SrpThreshold)
  }

  val srpMultiProbeSql: String =
    srpPairSql("bit_count(xor(ba.bucket, bb.bucket)) <= 1")

  /** Banded SRP (OR-amplification): candidate iff any contiguous
    * band of sign bits matches exactly. */
  private val SrpBands = 2 // 10 planes → 2 bands × 5 bits

  def srpBanded(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    Similarity.srpBandedNearDupPairs(e, "vec_id", "embedding", SrpDim,
      SrpPlanes, SrpBands, SrpThreshold)
  }

  val srpBandedSql: String = {
    val bandBits = SrpPlanes / SrpBands
    val mask = (1L << bandBits) - 1
    val cond = (0 until SrpBands).map { b =>
      s"((ba.bucket >> ${b * bandBits}) & $mask) = " +
        s"((bb.bucket >> ${b * bandBits}) & $mask)"
    }.mkString("(", " OR ", ")")
    srpPairSql(cond)
  }

  /** Embedding dedup CLUSTERS: banded-SRP near-dup pairs (the
    * highest-recall bucket join) feed connected components — the
    * linear corpus-scale deliverable for embedding near-dup removal,
    * completing the cluster story across text (q_minhash_clusters),
    * image (q_image_clusters) and embedding modalities. */
  def embedClusters(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    val pairs = Similarity.srpBandedNearDupPairs(e, "vec_id",
      "embedding", SrpDim, SrpPlanes, SrpBands, SrpThreshold)
    graft.operators.Dedup.dedupClusters(
      e.select(col("vec_id").as("id")), pairs.select("id_a", "id_b"))
      .select(col("id").as("vec_id"), col("comp"), col("is_canonical"))
  }

  val embedClustersSql: String = {
    val bandBits = SrpPlanes / SrpBands
    val mask = (1L << bandBits) - 1
    val cond = (0 until SrpBands).map { b =>
      s"((ba.bucket >> ${b * bandBits}) & $mask) = " +
        s"((bb.bucket >> ${b * bandBits}) & $mask)"
    }.mkString("(", " OR ", ")")
    s"""
WITH RECURSIVE $srpBucketSql,
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y)) /
      (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
         FROM (SELECT unnest(a.embedding) AS x))) *
       sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
         FROM (SELECT unnest(b.embedding) AS y)))) AS score
    FROM embeddings a, embeddings b, bk ba, bk bb
    WHERE a.vec_id < b.vec_id
      AND ba.vec_id = a.vec_id AND bb.vec_id = b.vec_id
      AND $cond
  ) WHERE score >= $SrpThreshold
),
nodes AS (SELECT vec_id AS id FROM embeddings)""" +
      OracleSql.ccSuffix("vec_id")
  }

  // ---- deterministic hash split / subsample ----

  /** Train/val/test carve by content-stable hash (80/10/10): the
    * id-sum per split pins the EXACT membership, not just sizes. */
  def hashSplit(spark: SparkSession, sf: String): DataFrame = {
    val docs = t(spark, sf, "documents")
    graft.operators.Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .groupBy("split_name")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"))
  }

  val hashSplitSql: String = s"""
WITH b AS (
  SELECT doc_id,
    (${hex2dec("md5(CAST(doc_id AS VARCHAR))")} % 10) AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 8 THEN 'train'
            WHEN bucket < 9 THEN 'val' ELSE 'test' END AS split_name,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM b GROUP BY 1"""

  /** Deterministic 1/4 subsample — returns the surviving ids so the
    * oracle checks exact membership. */
  def hashSample(spark: SparkSession, sf: String): DataFrame = {
    val docs = t(spark, sf, "documents")
    graft.operators.Sampling.sampleByHash(docs, "doc_id", 1, 4)
      .select(col("doc_id"))
  }

  val hashSampleSql: String = s"""
SELECT doc_id FROM documents
WHERE (${hex2dec("md5(CAST(doc_id AS VARCHAR))")} % 4) < 1"""

  // ---- hi-dim SRP bucket (production shape) ----
  private val HiDim = 768
  private val HiPlanes = 32

  /** SRP bucketing at production embedding shape (768 dims × 32
    * planes) — the scale gate for the single-pass [[graft.functions
    * .SrpBucket]] expression: a composed-Column formulation would
    * materialize 768×32 ≈ 25k nodes and fall out of codegen; this
    * plan carries exactly ONE projection node. The driver table's
    * 64-dim embeddings are widened by a deterministic formula of
    * vec_id so both engines compute the identical input vector. */
  def srpHiDim(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings").select("vec_id")
    val vec = transform(sequence(lit(0), lit(HiDim - 1)),
      i => ((col("vec_id") * 31 + i * 17) % 97).cast("double")
        .divide(lit(97.0)).minus(lit(0.5)).cast("float"))
    e.select(col("vec_id"),
      Similarity.srpBucket(vec, HiDim, HiPlanes).as("bucket"))
  }

  val srpHiDimSql: String = s"""
SELECT vec_id,
  CAST(SUM(CASE WHEN proj > 0
    THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS BIGINT)
    AS bucket
FROM (
  SELECT e.vec_id, p.p,
    SUM(CAST(CAST(CAST((e.vec_id * 31 + d.i * 17) % 97 AS DOUBLE) / 97.0
          - 0.5 AS REAL) AS DOUBLE) *
        ((CAST((1 + p.p * 7919 + d.i * 104729) % 1000003 AS DOUBLE)
          / 500001.5) - 1.0)) AS proj
  FROM embeddings e, range(0, $HiPlanes) p(p), range(0, $HiDim) d(i)
  GROUP BY 1, 2
) GROUP BY 1"""

  // ---- IVF (inverted-file) ANN top-k ----
  private val IvfCentroids = 8
  private val IvfProbes = 2
  private val IvfK = 3

  /** Coarse quantizer = the first `IvfCentroids` vectors (a
    * deterministic stand-in for trained centroids); candidates join
    * probe lists on `list_id` — nothing all-pairs. */
  def ivfTopK(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    val cents = e.where(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val queries = e.where(col("vec_id") >= 100 && col("vec_id") < 105)
    Similarity.ivfTopK(e, queries, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = IvfK, nProbe = IvfProbes)
  }

  /** IVF oracle body shared by the fixed-quantizer and trained-
    * quantizer queries: assignment / probes / scoring over the
    * embeddings parquet, parameterized by the `cents` CTE. */
  private def ivfSql(centsCte: String, probes: Int = IvfProbes,
      k: Int = IvfK): String = {
    def l2(a: String, b: String) =
      s"""(SELECT sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
           (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))
         FROM (SELECT unnest($a) AS x, unnest($b) AS y))"""
    def cos(a: String, b: String) =
      s"""((SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       FROM (SELECT unnest($a) AS x, unnest($b) AS y)) /
      (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
         FROM (SELECT unnest($a) AS x))) *
       sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
         FROM (SELECT unnest($b) AS y)))))"""
    s"""
WITH cents AS (
  $centsCte
),
asg AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY ${l2("e.embedding", "c.cvec")} ASC, c.cent_id ASC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY ${l2("e.embedding", "c.cvec")} ASC, c.cent_id ASC) AS rn
    FROM embeddings e, cents c
    WHERE e.vec_id >= 100 AND e.vec_id < 105
  ) WHERE rn <= $probes
),
scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
    ${cos("qe.embedding", "ce.embedding")} AS score
  FROM probes q
  JOIN asg a ON q.list_id = a.list_id AND q.vec_id <> a.vec_id
  JOIN embeddings qe ON qe.vec_id = q.vec_id
  JOIN embeddings ce ON ce.vec_id = a.vec_id
)
SELECT query_id, cand_id, CAST(rank AS INT) AS rank, score FROM (
  SELECT query_id, cand_id, score,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, cand_id ASC) AS rank
  FROM scored
) WHERE rank <= $k"""
  }

  val ivfTopKSql: String = ivfSql(
    s"SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings " +
      s"WHERE vec_id < $IvfCentroids")

  /** IVF through the PERSISTED-index lifecycle: build
    * [[Similarity.ivfIndex]] over the % 5 != 4 corpus, append the
    * % 5 == 4 batch under the frozen quantizer
    * ([[Similarity.ivfIndexAppend]] — only the batch is assigned),
    * then serve top-k from the stored assignment
    * ([[Similarity.ivfIndexTopK]]). The result must be IDENTICAL to
    * q_ivf_topk's one-shot full-table run — same oracle SQL, so the
    * incremental-assignment equivalence is DuckDB-pinned. */
  def ivfIncr(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    val cents = e.where(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val idx = Similarity.ivfIndexAppend(
      Similarity.ivfIndex(e.where(col("vec_id") % 5 =!= 4),
        "vec_id", "embedding", cents, "cent_id", "cvec"),
      e.where(col("vec_id") % 5 === 4), "vec_id", "embedding")
    val queries = e.where(col("vec_id") >= 100 && col("vec_id") < 105)
    Similarity.ivfIndexTopK(idx, queries, "vec_id", "embedding",
      k = IvfK, nProbe = IvfProbes)
  }

  val ivfIncrSql: String = ivfTopKSql

  // ---- IVF at a PRODUCTION-SHAPED list count (K = 256) ----
  // exercises the reference-object centroid index
  // (graft.functions.IvfCentroids): at K=256×64dim the old
  // per-centroid struct-literal plan was already thousands of nodes;
  // this stays ONE ivf_nearest node per side at any K.
  private val IvfBigK = 256
  private val IvfBigProbes = 4

  def ivfK256(spark: SparkSession, sf: String): DataFrame = {
    val e = t(spark, sf, "embeddings")
    val cents = e.where(col("vec_id") < IvfBigK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val queries = e.where(col("vec_id") >= 100 && col("vec_id") < 105)
    Similarity.ivfTopK(e, queries, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = IvfK, nProbe = IvfBigProbes)
  }

  val ivfK256Sql: String = ivfSql(
    s"SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings " +
      s"WHERE vec_id < $IvfBigK", probes = IvfBigProbes)

  // ---- IVF with a TRAINED coarse quantizer (deterministic k-means) ----
  private val IvfTrainN = 64
  private val IvfTrainDim = 64
  private val IvfTrainK = 8
  private val IvfTrainIters = 5

  /** Deterministic training vector component (id, i): identical
    * arithmetic on the Spark side (column expressions), in pure Scala
    * (the oracle's centroid computation) and implicitly in DuckDB —
    * the oracle embeds only the FINAL trained centroids as literals,
    * the knnZonesSql pattern for engine-computed values. */
  private def trainVal(id: Long, i: Int): Float =
    (((id * 13 + i * 7) % 53).toDouble / 53.0 - 0.5).toFloat

  /** Trained quantizer, computed once in pure Scala (the same
    * [[graft.operators.KMeans.lloyd]] the Spark path runs). */
  private lazy val trainedCentroids: Array[Array[Float]] =
    graft.operators.KMeans.lloyd(
      (0L until IvfTrainN.toLong).map(id =>
        Array.tabulate(IvfTrainDim)(i => trainVal(id, i))).toIndexedSeq,
      IvfTrainK, IvfTrainIters)

  /** IVF top-k with an ENGINE-TRAINED coarse quantizer: the trainer
    * runs through the real Spark path (DataFrame sample → driver
    * Lloyd's), then the embeddings table is assigned/probed through
    * the shuffle-free ivfTopK join. The training set is synthesized
    * from a pure formula so the static oracle can embed the identical
    * centroids; determinism of the Spark-side training against the
    * pure-Scala computation is asserted in-query. */
  def ivfTrained(spark: SparkSession, sf: String): DataFrame = {
    val train = spark.range(IvfTrainN).select(col("id"),
      transform(sequence(lit(0), lit(IvfTrainDim - 1)),
        i => ((col("id") * 13 + i * 7) % 53).cast("double")
          .divide(lit(53.0)).minus(lit(0.5)).cast("float")).as("vec"))
    val cents = graft.operators.KMeans.trainFromDataFrame(
      train, "id", "vec", IvfTrainK, IvfTrainIters, IvfTrainN)
    require(cents.map(_.toSeq) sameElements trainedCentroids.map(_.toSeq),
      "Spark-side k-means diverged from the deterministic training")
    val e = t(spark, sf, "embeddings")
    val queries = e.where(col("vec_id") >= 100 && col("vec_id") < 105)
    Similarity.ivfTopK(e, queries,
      graft.operators.KMeans.centroidsDf(spark, cents),
      "vec_id", "embedding", "cent_id", "cvec",
      k = IvfK, nProbe = IvfProbes)
  }

  val ivfTrainedSql: String = ivfSql(
    trainedCentroids.zipWithIndex.map { case (v, i) =>
      s"SELECT CAST($i AS BIGINT) AS cent_id, " +
        s"CAST([${v.mkString(", ")}] AS REAL[]) AS cvec"
    }.mkString("\n  UNION ALL "))

  // ---- multimodal: audio frame-sampling over a binary column ----
  val AudioTracks = 50
  val AudioSamples = 4000
  val AudioStride = 4

  def audioFrameSample(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    val n = AudioSamples; val stride = AudioStride
    spark.range(0, AudioTracks)
      .map(k => (k, graft.synth.Synth.pcm16Track(k, n)))
      .map { case (k, bytes) =>
        val (ns, frames, checksum) =
          graft.operators.MultimodalStubs.frameSample(bytes, stride)
        (k, ns, frames, checksum)
      }
      .toDF("track_id", "n_samples", "n_frames", "checksum")
  }

  val audioFrameSampleSql: String = s"""
WITH s AS (
  SELECT t.track_id, r.i,
    CAST(((t.track_id * 7919 + r.i * 37) % 1000) - 500 AS BIGINT) AS v
  FROM range(0, $AudioTracks) t(track_id), range(0, $AudioSamples) r(i)
)
SELECT track_id,
  CAST($AudioSamples AS BIGINT) AS n_samples,
  CAST(COUNT(*) FILTER (WHERE i % $AudioStride = 0) AS BIGINT) AS n_frames,
  CAST(SUM(v) FILTER (WHERE i % $AudioStride = 0) AS BIGINT) AS checksum
FROM s GROUP BY 1"""

  // ---- multimodal: video frame parse (REAL container split) ----
  val VideoCount = 20
  val VideoNFrames = 12
  val VideoStride = 3
  val VideoW = 8
  val VideoH = 8

  /** End-to-end video path: synthesize a concatenated-PNG stream per
    * video, SPLIT it on the PNG signature, DECODE every sampled frame
    * with the engine's PNG decoder, emit per-frame stats. The binary
    * really is parsed — the oracle recomputes the pixel field from
    * the generator formula. */
  def videoFrames(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    val nf = VideoNFrames; val stride = VideoStride
    val w = VideoW; val h = VideoH
    spark.range(0, VideoCount)
      .flatMap { k =>
        val bytes = graft.synth.Synth.videoPngStream(k, nf, w, h)
        graft.operators.Video.frameSampleStats(bytes, stride)
          .map { case (f, npx, sum) => (k, f, npx, sum) }
      }
      .toDF("video_id", "frame_idx", "n_px", "sum_px")
  }

  val videoFramesSql: String = s"""
WITH px AS (
  SELECT v.k, f.j, r.r, c.c,
    CAST((v.k * 31 + f.j * 17 + r.r * 7 + c.c * 3) % 251 AS DOUBLE) AS p
  FROM range(0, $VideoCount) v(k), range(0, $VideoNFrames) f(j),
       range(0, $VideoH) r(r), range(0, $VideoW) c(c)
  WHERE f.j % $VideoStride = 0
)
SELECT k AS video_id, CAST(j AS INT) AS frame_idx,
  CAST(count(*) AS BIGINT) AS n_px, SUM(p) AS sum_px
FROM px GROUP BY 1, 2"""

  // ---- compressed media: IMA ADPCM audio, inter-frame delta video ----
  val AdpcmTracks = 40
  val AdpcmSamples = 1000
  val AdpcmMae = 16.0

  /** REAL compressed-audio decode: each clip is IMA ADPCM
    * ([[graft.functions.AdpcmCodec]] — the WAV 0x0011 codec) of a
    * triangle wave; the engine decodes the nibble stream and emits
    * exact layout facts (sample count, first sample = the block
    * predictor, encoded byte length — all arithmetic the oracle
    * recomputes without decoding) plus a mean-abs-error quality gate
    * against the generator formula (lossy codec ⇒ bounds, not
    * equality — the jpegPsnr pattern). */
  def audioAdpcm(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    val n = AdpcmSamples
    spark.range(0, AdpcmTracks).map { k =>
      val bytes = graft.synth.Synth.adpcmTrack(k, n)
      val dec = graft.functions.AdpcmCodec.decode(bytes)
      var absErr = 0.0
      var i = 0
      while (i < dec.length) {
        val o = math.abs(((k * 37 + i * 19) % 2000) - 1000) - 500
        absErr += math.abs(dec(i) - o.toDouble)
        i += 1
      }
      (k, dec.length.toLong, dec(0).toInt, bytes.length.toLong,
        absErr / dec.length <= AdpcmMae)
    }.toDF("track_id", "n_samples", "first_sample", "n_bytes", "mae_ok")
  }

  val audioAdpcmSql: String = s"""
SELECT t.track_id,
  CAST($AdpcmSamples AS BIGINT) AS n_samples,
  CAST(ABS(((t.track_id * 37) % 2000) - 1000) - 500 AS INT)
    AS first_sample,
  CAST(4 + $AdpcmSamples / 2 AS BIGINT) AS n_bytes,
  TRUE AS mae_ok
FROM range(0, $AdpcmTracks) t(track_id)"""

  /** REAL inter-frame video decode: the same pixel field as
    * [[videoFrames]] but compressed temporally
    * ([[graft.functions.DeltaVideoCodec]] — keyframe + P-frames of
    * zigzag-varint RLE deltas). Every frame is reconstructed through
    * the temporal dependency chain; the codec is lossless, so the
    * oracle is EXACT equality with the generator formula — a frame
    * mis-predicted from its predecessor would shift every later
    * frame's sum. */
  def videoDelta(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    spark.range(0, VideoCount).flatMap { k =>
      val (_, _, frames) = graft.functions.DeltaVideoCodec.decode(
        graft.synth.Synth.videoDeltaStream(k, VideoNFrames, VideoW,
          VideoH))
      frames.zipWithIndex.map { case (px, j) =>
        var sum = 0.0
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        (k, j, px.length.toLong, sum)
      }
    }.toDF("video_id", "frame_idx", "n_px", "sum_px")
  }

  val videoDeltaSql: String = s"""
WITH px AS (
  SELECT v.k, f.j, r.r, c.c,
    CAST((v.k * 31 + f.j * 17 + r.r * 7 + c.c * 3) % 251 AS DOUBLE) AS p
  FROM range(0, $VideoCount) v(k), range(0, $VideoNFrames) f(j),
       range(0, $VideoH) r(r), range(0, $VideoW) c(c)
)
SELECT k AS video_id, CAST(j AS INT) AS frame_idx,
  CAST(count(*) AS BIGINT) AS n_px, SUM(p) AS sum_px
FROM px GROUP BY 1, 2"""
}
