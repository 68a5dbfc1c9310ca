package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: attribute q_minhash_lsh end-to-end time by counting
  * successive PREFIXES of the exact pipeline (no extra persists, so
  * each prefix recomputes the same upstream work — differences
  * attribute stage cost). */
object ProfLsh6 {
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
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))

    def members = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ckey")
      docs.select(col("doc_id").as("id"),
        TextOps.tokenSetKey(col("text")).as("ckey"))
        .withColumn("rid", min("id").over(w))
    }
    val m = members.persist() // as in minhashDedup
    t("prefix0: members") { m.count() }
    def reps = docs.select(col("doc_id").as("id"), col("text"))
      .join(m.where(col("id") === col("rid")).select("id"), Seq("id"))
    def hashes = TextOps.tokenHashes(reps, "id", "text")
    def sig = TextOps.minhashSignature(hashes, 8)
    def bands = TextOps.bandKeys(sig, 4, 2)
    def cand = {
      val l = bands.select(col("band_key"), col("id").as("id_a"))
      val r = bands.select(col("band_key"), col("id").as("id_b"))
      l.join(r, Seq("band_key"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }
    def tokSets = reps.select(col("id"),
      array_distinct(TextOps.tokens(col("text"))).as("toks"))
    def verified = cand
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
    def cross = verified
      .select(col("id_a").as("rid_a"), col("id_b").as("rid_b"),
        col("jaccard"))
      .join(m.select(col("rid").as("rid_a"), col("id").as("ma")),
        Seq("rid_a"))
      .join(m.select(col("rid").as("rid_b"), col("id").as("mb")),
        Seq("rid_b"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("jaccard"))
    def intra = m.select(col("ckey"), col("id").as("id_a"))
      .join(m.select(col("ckey"), col("id").as("id_b")), Seq("ckey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))

    t("prefix1: cand") { System.err.println(s"  ${cand.count()}") }
    t("prefix2: verified") { System.err.println(s"  ${verified.count()}") }
    t("prefix3: cross") { System.err.println(s"  ${cross.count()}") }
    t("prefix4: intra") { System.err.println(s"  ${intra.count()}") }
    t("prefix5: full union") {
      System.err.println(s"  ${intra.unionByName(cross).count()}")
    }
    s.stop()
  }
}
