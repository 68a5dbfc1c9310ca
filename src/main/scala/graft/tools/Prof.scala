package graft.tools

/** Parameterized dev profiler — the consolidation of the round-5
  * one-off probes (ProfLsh5/6/7, ProbeLsh, Prof3, ProfClusters/2,
  * ProfWinnow), whose findings now live in the operator scaladocs.
  *
  * Usage: runMain graft.tools.Prof <mode> [sfDir] [query] [n] [cores]
  *
  *   reps  <sfDir> <query> [n=3] [cores=32]
  *       cold + n warm end-to-end reps of any SparkEntry query, with
  *       per-rep wall / GC-ms / heap-peak (the same telemetry the
  *       bench records) and Caches.drain between reps.
  *   plan  <sfDir> <query> [_] [cores=32]
  *       formatted physical plan after one warm-up execution (AQE
  *       final plan, join strategies, codegen spans).
  *   count <sfDir> <query> [_] [cores=32]
  *       row count + timing only (cardinality probe).
  *
  * Every SparkEntry query name works (q_minhash_lsh, q_winnow_pairs,
  * q_minhash_clusters, q_zonal_basic, …), so a new straggler found in
  * Verify's per-query stderr log is profiled without writing a new
  * main.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("reps")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val qname = if (args.length > 2) args(2) else "q_minhash_lsh"
    val n = if (args.length > 3) args(3).toIntOption.getOrElse(3) else 3
    val cores = if (args.length > 4) args(4).toInt else 32
    val s = graft.Bench.session(cores)
    val fn = graft.SparkEntry.queries.getOrElse(qname,
      sys.error(s"unknown query '$qname' — one of: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    try mode match {
      case "reps" =>
        for (rep <- 0 to n) {
          val r = graft.BenchTelemetry.timed {
            System.err.println(s"  n=${fn(s, sf).count()}")
          }
          graft.engine.Caches.drain(s)
          System.gc()
          val tag = if (rep == 0) "cold" else s"warm$rep"
          System.err.println(f"PROF $qname $tag wall=${r.wall}%.2f s " +
            f"gc=${r.gcMs} ms heap_peak=${r.heapPeakMb} MB " +
            f"steal=${r.stealPct}%.1f%%")
        }
      case "plan" =>
        fn(s, sf).count() // warm-up: AQE finalizes, fixtures cache
        val df = fn(s, sf)
        df.count()
        System.err.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case "count" =>
        val t0 = System.nanoTime()
        System.err.println(
          s"PROF $qname n=${fn(s, sf).count()} " +
            f"in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "incrphases" =>
        // phase breakdown of the bench incremental growth path; sfDir
        // arg doubles as the bench-table root
        val root = sf
        graft.Bench.ensureIncrTable(s, root)
        val table = graft.sources.TileTable.open(root + "_incr")
        val zones = graft.Bench.benchZones(graft.Bench.benchGrid)
        val prev = s.read.parquet(root + "_incr_prev")
        def ph(tag: String)(b: => Long): Unit = {
          val t0 = System.nanoTime()
          val cnt = b
          System.err.println(
            f"PHASE $tag n=$cnt ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        for (_ <- 1 to n) {
          ph("readChanges") { graft.sources.TileTable
            .readChanges(s, root + "_incr", 1, table.version).count() }
          val delta = graft.sources.TileTable
            .readChanges(s, root + "_incr", 1, table.version)
          val ds = graft.operators.ZonalEngine.fidStatsFor(s, delta,
            zones, graft.Bench.benchGrid, Some(-9999.0))
          ph("deltaStats") { ds.count() }
          ph("merged") {
            graft.operators.ZonalStats.mergeFidStats(prev, ds).count() }
          ph("runIncremental") {
            graft.operators.ZonalEngine.runIncremental(s, table, zones,
              prev, 1).count() }
          graft.engine.Caches.drain(s)
        }
      case other => sys.error(s"unknown mode '$other' (reps|plan|count)")
    } finally s.stop()
  }
}
