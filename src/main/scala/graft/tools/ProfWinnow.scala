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
    // fingerprint stage alone, both paths — SAME parameters as the
    // queries above (DataQueries WinnowK=8, WinnowW=6, WinnowDocCap=150;
    // the md5 query has no ASCII filter, the rolling one does)
    val md5Docs = s.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") < 150)
    t("md5 fps count") {
      System.err.println("  n=" + graft.operators.TextOps
        .winnowFingerprints(md5Docs, "doc_id", "text", 8, 6).count())
    }
    val asciiDocs = md5Docs.where(col("text").rlike("\\A[ -~]*\\z"))
    t("rolling fps count") {
      System.err.println("  n=" + graft.operators.TextOps
        .winnowFingerprintsRolling(asciiDocs, "doc_id", "text", 8, 6)
        .count())
    }
    s.stop()
  }
}
