package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH band-join machinery. */
object Lsh {

  /** Hash-spread a banded frame over the session's full shuffle width
    * before a band self-join. The join's work is its OUTPUT (hot
    * buckets emit freq² candidate rows), so its parallelism must not
    * be inherited from a tiny upstream layout — with cached-plan AQE
    * re-optimization on (build.sbt), a dimension-sized signature cache
    * coalesces to ONE partition and the candidate explosion would run
    * on numBands tasks (measured 3× the wall of the spread join at
    * p32). Explicit numPartitions pins the width (AQE never coalesces
    * a REPARTITION_BY_NUM shuffle); hashing on the band key means a
    * sort-merge band join at corpus scale reuses this exchange as its
    * own required distribution — no extra shuffle where it matters. */
  def spreadBands(banded: DataFrame): DataFrame =
    banded.repartition(
      banded.sparkSession.sessionState.conf.numShufflePartitions,
      col("band_key"))

  /** Per-bucket frequency cap for a banded (key, member) frame — the
    * winnowing `maxDocFreq` guard generalized: adversarial inputs can
    * pile distinct contents into one band bucket even after
    * exact-duplicate collapse, and each such bucket costs freq²
    * candidate rows. Buckets holding more than `maxBandFreq` rows are
    * dropped LOUDLY (a dropped bucket is a recall decision the
    * operator must not make silently); `Int.MaxValue` disables the
    * cap with zero plan overhead. The frequency frame is persisted
    * (it feeds both the drop count and the keep join) and registered
    * with [[graft.engine.Caches]] for the caller's harness to drain. */
  def capBandBuckets(banded: DataFrame, keyCol: String,
      maxBandFreq: Int, tag: String): DataFrame = {
    if (maxBandFreq == Int.MaxValue) banded
    else {
      val freq = banded.groupBy(keyCol).agg(count(lit(1)).as("__freq"))
        .persist()
      graft.engine.Caches.register(banded.sparkSession,
        () => { freq.unpersist(false); () })
      val nDropped = freq.where(col("__freq") > maxBandFreq).count()
      if (nDropped > 0)
        System.err.println(s"[graft] $tag LSH: dropped $nDropped " +
          s"band bucket(s) over maxBandFreq=$maxBandFreq — pairs " +
          "joined ONLY through those buckets are not reported")
      banded.join(freq.where(col("__freq") <= maxBandFreq)
        .select(keyCol), Seq(keyCol))
    }
  }
}
