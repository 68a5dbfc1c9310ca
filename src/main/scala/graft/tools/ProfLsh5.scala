package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: q_minhash_lsh (sf0.1) wall time — clean end-to-end
  * reps (no stage persists polluting the measurement) plus a staged
  * timing of the exact-verify join. */
object ProfLsh5 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Bench.session(32)
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.TextOps

    for (rep <- 1 to 3) {
      t(s"lsh: END-TO-END rep$rep") {
        System.err.println(
          s"  n=${graft.engine.DataQueries.minhashLsh(s, sf).count()}")
      }
      graft.engine.Caches.drain(s)
    }

    // staged: candidates once, then the verify join from a persisted
    // candidate set so its cost is isolated
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("ckey")
    val members = docs.select(col("doc_id").as("id"),
      TextOps.tokenSetKey(col("text")).as("ckey"))
      .withColumn("rid", min("id").over(w)).persist()
    val reps = docs.select(col("doc_id").as("id"), col("text"))
      .join(members.where(col("id") === col("rid")).select("id"),
        Seq("id")).persist()
    reps.count()
    val hashes = TextOps.tokenHashes(reps, "id", "text")
    val sig = TextOps.minhashSignature(hashes, 8)
    val cand = t("stage: candidates (band join + distinct)") {
      val c = TextOps.lshCandidatePairs(sig, 4, 2).persist()
      System.err.println(s"  cand=${c.count()}")
      c
    }
    val tokSets = reps.select(col("id"),
      array_distinct(TextOps.tokens(col("text"))).as("toks")).persist()
    tokSets.count()
    t("stage: verify via array_intersect (from cached cand)") {
      val v = cand
        .join(tokSets.select(col("id").as("id_a"), col("toks").as("ta")),
          Seq("id_a"))
        .join(tokSets.select(col("id").as("id_b"), col("toks").as("tb")),
          Seq("id_b"))
        .withColumn("inter",
          size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("ta")) + size(col("tb")) - col("inter")).cast("double"))
        .where(col("jaccard") >= 0.66)
        .select("id_a", "id_b", "jaccard")
      System.err.println(s"  verified=${v.count()}")
    }
    t("stage: verify, intersect computed ONCE (aggregate barrier)") {
      // does expression duplication (project collapse pushes
      // array_intersect into jaccard + the filter) dominate?
      val v = cand
        .join(tokSets.select(col("id").as("id_a"), col("toks").as("ta")),
          Seq("id_a"))
        .join(tokSets.select(col("id").as("id_b"), col("toks").as("tb")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
          size(col("ta")).as("na"), size(col("tb")).as("nb"))
        .groupBy("id_a", "id_b")
        .agg(first("inter").as("inter"), first("na").as("na"),
          first("nb").as("nb"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
        .where(col("jaccard") >= 0.66)
      System.err.println(s"  verified=${v.count()}")
    }
    s.stop()
  }
}
