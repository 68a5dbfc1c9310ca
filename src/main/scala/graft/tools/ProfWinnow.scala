package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: where does q_winnow_pairs spend time at Verify's
  * local[4] settings? */
object ProfWinnow {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      t(s"q_winnow_pairs rep$rep") {
        graft.engine.DataQueries.winnowPairs(s, sf).count()
      }
      graft.engine.Caches.drain(s)
      t(s"q_winnow_rolling_pairs rep$rep") {
        graft.engine.DataQueries.winnowRollingPairs(s, sf).count()
      }
      graft.engine.Caches.drain(s)
    }
    // fingerprint stage alone, both paths
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") < 100000 && col("text").rlike("\\A[ -~]*\\z"))
    t("md5 fps count") {
      System.err.println("  n=" + graft.operators.TextOps
        .winnowFingerprints(docs, "doc_id", "text", 8, 4).count())
    }
    t("rolling fps count") {
      System.err.println("  n=" + graft.operators.TextOps
        .winnowFingerprintsRolling(docs, "doc_id", "text", 8, 4).count())
    }
    s.stop()
  }
}
