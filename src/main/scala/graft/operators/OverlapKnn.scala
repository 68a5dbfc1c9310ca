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
/** Broadcastable kNN index over zone centroids: STRtree built lazily
  * once per executor (same publication pattern as ZoneIndex). */
final class CentroidKnnIndex(val cents: Array[(Long, Double, Double)])
    extends Serializable {
  @transient @volatile private var _tree
      : org.locationtech.jts.index.strtree.STRtree = _

  private def tree(): org.locationtech.jts.index.strtree.STRtree = {
    if (_tree == null) synchronized {
      if (_tree == null) {
        val t = new org.locationtech.jts.index.strtree.STRtree()
        cents.foreach { case (fid, x, y) =>
          t.insert(new org.locationtech.jts.geom.Envelope(
            new Coordinate(x, y)), (fid, x, y))
        }
        t.build()
        _tree = t
      }
    }
    _tree
  }

  private object dist
      extends org.locationtech.jts.index.strtree.ItemDistance {
    override def distance(
        a: org.locationtech.jts.index.strtree.ItemBoundable,
        b: org.locationtech.jts.index.strtree.ItemBoundable): Double = {
      def xy(i: org.locationtech.jts.index.strtree.ItemBoundable) =
        i.getItem match {
          case (_: Long, x: Double, y: Double) => (x, y)
        }
      val (ax, ay) = xy(a); val (bx, by) = xy(b)
      val dx = ax - bx; val dy = ay - by
      math.sqrt(dx * dx + dy * dy)
    }
  }

  /** k nearest (fid, dist) pairs, tie-broken (dist ASC, fid ASC). */
  def nearest(x: Double, y: Double, k: Int): Seq[(Long, Double)] = {
    val probe = (Long.MinValue, x, y)
    val res = tree().nearestNeighbour(
      new org.locationtech.jts.geom.Envelope(new Coordinate(x, y)),
      probe, dist, k)
    res.toSeq.map { item =>
      val (fid, cx, cy) = item.asInstanceOf[(Long, Double, Double)]
      val dx = x - cx; val dy = y - cy
      (fid, math.sqrt(dx * dx + dy * dy))
    }.sortBy { case (fid, d) => (d, fid) }
  }
}

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
    * for each point row (id, x, y). Zone centroids broadcast in a
    * per-executor STRtree; JTS `nearestNeighbour(..., k)` answers
    * each probe in O(log n) instead of a linear scan, then results
    * are re-sorted with the deterministic (dist ASC, fid ASC)
    * tie-break. */
  def nearestZones(spark: SparkSession, points: DataFrame,
      zones: Seq[Zone], k: Int): DataFrame = {
    import spark.implicits._
    val cents = zones.map(z => {
      val c = z.geom.getCentroid
      (z.fid, c.getX, c.getY)
    }).toArray
    val bc = spark.sparkContext.broadcast(new CentroidKnnIndex(cents))
    points.select(col("id").cast("long"), col("x").cast("double"),
      col("y").cast("double")).as[(Long, Double, Double)]
      .flatMap { case (id, x, y) =>
        bc.value.nearest(x, y, k)
          .zipWithIndex.map { case ((f, d), r) => (id, f, r + 1, d) }
      }.toDF("id", "fid", "rank", "dist")
  }
}
