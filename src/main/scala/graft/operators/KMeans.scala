package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Deterministic k-means trainer for the IVF coarse quantizer
  * ([[Similarity.ivfTopK]]).
  *
  * Shape chosen for the 100 TB pipeline: train on a BOUNDED,
  * deterministically-chosen sample on the driver (standard practice —
  * quantizer quality needs thousands of points, not the full table),
  * then assign the full table distributively through the shuffle-free
  * per-row argmin in `ivfTopK`. No RNG anywhere: same inputs → the
  * same centroids bit-for-bit on any machine, which keeps resumed /
  * re-run index builds consistent and lets oracles embed
  * engine-computed centroids as literals.
  */
object KMeans {

  /** Σ (pᵢ−cᵢ)² in float64, ascending index order. */
  private def dist2(p: Array[Float], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(p.length, c.length)
    while (i < n) {
      val d = p(i).toDouble - c(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Deterministic Lloyd's iterations: init = the first `k` points,
    * exactly `iters` passes, L2 assignment with ties to the LOWER
    * centroid index, cluster means accumulated in input order
    * (float64); an emptied cluster keeps its previous centroid.
    * Final centroids rounded to float32 (the embedding dtype). */
  def lloyd(points: IndexedSeq[Array[Float]], k: Int,
      iters: Int): Array[Array[Float]] = {
    require(k > 0 && points.size >= k,
      s"need at least k=$k training points, got ${points.size}")
    val dim = points.head.length
    var cents: Array[Array[Double]] =
      points.take(k).map(_.map(_.toDouble)).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      for (p <- points) {
        var best = 0
        var bestD = dist2(p, cents(0))
        var c = 1
        while (c < k) {
          val d = dist2(p, cents(c))
          if (d < bestD) { best = c; bestD = d } // tie keeps lower index
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    cents.map(_.map(_.toFloat))
  }

  /** Train from a DataFrame: the sample is the `sampleSize` rows with
    * the LOWEST ids (a deterministic choice — at scale, substitute any
    * deterministic hash-bucket predicate), collected in id order and
    * run through [[lloyd]] on the driver. */
  def trainFromDataFrame(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, sampleSize: Int): Array[Array[Float]] = {
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol).asc).limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](1).toArray)
      .toIndexedSeq
    lloyd(sample, k, iters)
  }

  /** Centroid table (cent_id ascending from 0) for [[Similarity.ivfTopK]]. */
  def centroidsDf(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Float]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("cent_id", "cvec")
  }
}
