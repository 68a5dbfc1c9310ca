package graft.operators

import graft.geom.{Zone, ZoneIndex}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** Polygon-polygon overlap analysis + kNN lookup — the north-star
  * spatial extras beyond the reference's zonal kernel (the disjoint-
  * set machinery at `/root/reference/runner.py:479-489` is the
  * reference's only overlap-awareness; here overlap is a first-class
  * analysis op).
  */
object OverlapKnn {

  /** Intersection area of every (a, b) pair with positive overlap:
    * `a` streams through Spark, `b` is broadcast as a ZoneIndex, so
    * the candidate lookup is an R-tree probe, not a cross join. */
  def overlapPairs(spark: SparkSession, zonesA: DataFrame,
      bcB: Broadcast[ZoneIndex]): DataFrame = {
    import spark.implicits._
    zonesA.select($"fid", $"geom_wkb").as[(Long, Array[Byte])]
      .flatMap { case (fidA, wkb) =>
        val g = Zone.fromWkb(wkb)
        val idx = bcB.value
        idx.candidates(g.getEnvelopeInternal).iterator.flatMap { i =>
          val zb = idx.zones(i)
          if (idx.prepared(i).intersects(g)) {
            val area = zb.geom.intersection(g).getArea
            if (area > 0.0) Some((fidA, zb.fid, area)) else None
          } else None
        }
      }.toDF("fid_a", "fid_b", "overlap_area")
  }

  /** k nearest zones (by euclidean distance to the zone centroid)
    * for each point row (id, x, y). Zones broadcast; per-partition
    * linear scan over the centroid array (zone tables are dimension-
    * sized; an STRtree kNN drop-in covers larger ones). Deterministic
    * (dist ASC, fid ASC) tie-break. */
  def nearestZones(spark: SparkSession, points: DataFrame,
      zones: Seq[Zone], k: Int): DataFrame = {
    import spark.implicits._
    val cents = zones.map(z => {
      val c = z.geom.getCentroid
      (z.fid, c.getX, c.getY)
    }).toArray
    val bc = spark.sparkContext.broadcast(cents)
    points.select(col("id").cast("long"), col("x").cast("double"),
      col("y").cast("double")).as[(Long, Double, Double)]
      .flatMap { case (id, x, y) =>
        bc.value.iterator.map { case (fid, cx, cy) =>
          val dx = x - cx; val dy = y - cy
          (id, fid, math.sqrt(dx * dx + dy * dy))
        }.toSeq.sortBy { case (_, fid, d) => (d, fid) }.take(k)
          .zipWithIndex.map { case ((i, f, d), r) => (i, f, r + 1, d) }
      }.toDF("id", "fid", "rank", "dist")
  }
}
