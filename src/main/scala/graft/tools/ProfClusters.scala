package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe: where does q_minhash_clusters spend its time? */
object ProfClusters {
  def main(args: Array[String]): Unit = {
    val s = graft.Bench.session(32)
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.engine.DataQueries.clusterDocs(s)
    val members = t("members") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ckey")
      val m = docs.select(col("doc_id").as("id"),
        graft.operators.TextOps.tokenSetKey(col("text")).as("ckey"))
        .withColumn("rid", min("id").over(w)).persist()
      m.count(); m
    }
    val reps = t("reps") {
      val r = docs.select(col("doc_id").as("id"), col("text"))
        .join(members.where(col("id") === col("rid")).select("id"), Seq("id"))
      r.count(); r
    }
    val edges = t("pairs (LSH+verify)") {
      val e = graft.operators.TextOps.minhashDedup(reps, "id", "text",
        8, 4, 0.5).persist()
      e.count(); e
    }
    val nodes = members.select(col("rid").as("id")).distinct()
    val comps = t("connectedComponents") {
      val c = graft.operators.Dedup.connectedComponents(nodes,
        edges.select("id_a", "id_b"))
      c.count(); c
    }
    t("final join") {
      members.join(comps.select(col("id").as("rid"), col("comp")),
        Seq("rid")).count()
    }
    s.stop()
  }
}
