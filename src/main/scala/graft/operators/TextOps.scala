package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis + deduplication operators for large-scale
  * training-data pipelines: tokenization, quality scoring, language
  * ID, exact dedup, n-gram Jaccard and MinHash+LSH near-dedup.
  *
  * All built from codegen'd `org.apache.spark.sql.functions` (no
  * Scala UDFs in the hot path); every hash is derived from `md5` so
  * an external SQL engine can replicate results bit-for-bit.
  */
object TextOps {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct-token count + raw token count per row. */
  def tokenCounts(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_tokens", size(tokens(text)))
      .withColumn("n_distinct_tokens", size(array_distinct(tokens(text))))

  /** Heuristic quality score: length, punctuation density, mean token
    * length, whitespace ratio — exact integer counts over the text,
    * combined in double. */
  def qualityScore(df: DataFrame, text: Column): DataFrame = {
    val nChars = length(text)
    val nSpaces = nChars - length(regexp_replace(text, " ", ""))
    val nPunct = nChars - length(regexp_replace(text, "[.,!?;:]", ""))
    val nTok = size(tokens(text))
    df.withColumn("n_chars_m", nChars.cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("punct_ratio", nPunct.cast("double") / nChars)
      .withColumn("space_ratio", nSpaces.cast("double") / nChars)
      .withColumn("mean_token_len",
        (nChars - nSpaces).cast("double") / nTok)
  }

  /** n-gram-heuristic language ID: score each candidate language by
    * the fraction of tokens found in its marker list; argmax with
    * deterministic (score DESC, lang ASC) tie-break. The marker lists
    * are tiny builtin stopword sets. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "en", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  def langId(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val markers = langMarkers.flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("cand_lang", "marker")
    val toks = df.select(idCol.as("id"),
      explode(tokens(text)).as("tok"))
    val total = toks.groupBy("id").agg(count("*").as("n_tok"))
    val hits = toks.join(broadcast(markers), $"tok" === $"marker")
      .groupBy("id", "cand_lang").agg(count("*").as("n_hit"))
    val scored = total.join(hits, Seq("id"), "left_outer")
      .withColumn("score",
        coalesce($"n_hit", lit(0L)).cast("double") / $"n_tok")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"id")
      .orderBy($"score".desc, $"cand_lang".asc)
    scored.withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"id", $"cand_lang".as("pred_lang"), $"score")
  }

  /** Distinct char n-gram set of the first `maxChars` characters. */
  def ngramShingles(text: Column, n: Int, maxChars: Int): Column = {
    val t = substring(text, 1, maxChars)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n))))
  }

  /** All (a<b) pairs with n-gram Jaccard >= minJaccard. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxChars: Int, minJaccard: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"),
      ngramShingles(col(textCol), n, maxChars).as("sh_a"))
    val b = df.select(col(idCol).as("id_b"),
      ngramShingles(col(textCol), n, maxChars).as("sh_b"))
    a.crossJoin(broadcast(b))
      .where(col("id_a") < col("id_b"))
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni",
        size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- MinHash + LSH near-dedup -----------------------------------

  val MinHashP = 2147483647L // 2^31 - 1

  /** md5-derived 60-bit token hash (first 15 hex digits), reduced
    * mod p. `conv` keeps this replicable in any SQL engine. */
  def tokenHash(tok: Column): Column =
    (conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % MinHashP)

  def minhashA(k: Int): Long = 1103L + 29L * k
  def minhashB(k: Int): Long = 12345L + 7L * k

  /** One row per (id, token) with the reduced token hash. */
  def tokenHashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("hm", tokenHash(col("tok")))

  /** k-permutation MinHash signature: sig_k = min((a_k*h + b_k) mod p). */
  def minhashSignature(hashes: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(k =>
      min((col("hm") * minhashA(k) + minhashB(k)) % MinHashP).as(s"sig$k"))
    hashes.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures banded `numBands` × `rowsPerBand`;
    * docs sharing a band bucket become candidates. The band join is
    * the scale path — candidates shuffle on the band key, never the
    * full O(n²) pair space. */
  def lshCandidatePairs(sig: DataFrame, numBands: Int,
      rowsPerBand: Int): DataFrame = {
    val bands = (0 until numBands).map { b =>
      val key = concat_ws("_", (lit(b) +:
        (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))): _*)
      sig.select(col("id"), key.as("band_key"))
    }.reduce(_ unionByName _)
    val l = bands.select(col("band_key"), col("id").as("id_a"))
    val r = bands.select(col("band_key"), col("id").as("id_b"))
    l.join(r, Seq("band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash-LSH near-dedup: candidates via banding, verified
    * with exact token-set Jaccard >= minJaccard. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, numBands: Int, minJaccard: Double): DataFrame = {
    // the token-hash cache feeds four consumers of the RETURNED lazy
    // plan, so it cannot be unpersisted here; register it so loop
    // callers can drain between iterations (graft.engine.Caches)
    val hashes = tokenHashes(df, idCol, textCol).persist()
    graft.engine.Caches.register(df.sparkSession,
      () => { hashes.unpersist(false); () })
    val sig = minhashSignature(hashes, numHashes)
    val cand = lshCandidatePairs(sig, numBands, numHashes / numBands)
    val sizes = hashes.groupBy("id")
      .agg(countDistinct("tok").as("n_tok"))
    val inter = cand
      .join(hashes.select(col("id").as("id_a"), col("tok")), Seq("id_a"))
      .join(hashes.select(col("id").as("id_b"), col("tok")), Seq("id_b", "tok"))
      .groupBy("id_a", "id_b").agg(count("*").as("inter"))
    cand.join(inter, Seq("id_a", "id_b"), "left_outer")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("id").as("id_a"), col("n_tok").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_tok").as("nb")), Seq("id_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact dedup summary per group column: documents vs distinct
    * texts (md5 content hash). */
  def exactDedupSummary(df: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    df.groupBy(groupCol).agg(
      count("*").as("n_docs"),
      countDistinct(md5(col(textCol))).as("n_distinct"))

  /** SimHash over tokens, `bits` wide (md5-derived, SQL-replicable):
    * bit b set iff sum over distinct tokens of ±1 (by token-hash bit
    * b) is positive. */
  def simhash(hashes: DataFrame, bits: Int): DataFrame = {
    val bitSums = (0 until bits).map { b =>
      sum(when((col("hm").divide(1L << b)).cast("long") % 2 === 1, 1)
        .otherwise(-1)).as(s"bs$b")
    }
    val sums = hashes.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until bits).map(b =>
      when(col(s"bs$b") > 0, 1L << b).otherwise(0L)).reduce(_ + _)
    sums.select(col("id"), sh.as("simhash"))
  }
}
