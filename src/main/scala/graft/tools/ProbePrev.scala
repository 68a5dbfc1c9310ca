package graft.tools
object ProbePrev {
  def main(args: Array[String]): Unit = {
    val s = graft.Bench.session(32)
    val root = "data/bench_tiles"
    val t = graft.sources.TileTable.open(root)
    val zones = graft.Bench.benchZones(graft.Bench.benchGrid)
    val fresh = graft.operators.ZonalEngine.fidStatsFor(s,
      t.read(s), zones, graft.Bench.benchGrid, t.nodata)
    val fids = fresh.select("fid").distinct().collect().map(_.getLong(0)).sorted
    System.err.println(s"PROBE full fids n=${fids.length}")
    val missing = zones.map(_.fid).filterNot(fids.toSet)
    System.err.println(s"PROBE missing n=${missing.length}: ${missing.take(30).mkString(",")}")
    // geometry of one missing zone
    missing.headOption.foreach { f =>
      val z = zones.find(_.fid == f).get
      System.err.println(s"PROBE zone $f env=${z.geom.getEnvelopeInternal} area=${z.geom.getArea}")
    }
    s.stop()
  }
}
