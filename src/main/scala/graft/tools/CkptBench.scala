package graft.tools

/** Ad-hoc probe: checkpointed-path wall time at the bench table under
  * the current GRAFT_CKPT_CONCURRENCY env. */
object CkptBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val root = "/root/repo/data/bench_tiles"
    val s = graft.Bench.session(32)
    // warm the session + the honest zonal-only denominator
    val direct = (1 to 3).map(_ => graft.Bench.runZonalOnly(s, root)).min
    (1 to reps).foreach { _ =>
      val t = graft.Bench.runCheckpointed(s, root)
      // scalastyle:off println
      println(f"CKPT $t%.2f s directZonal=$direct%.2f s " +
        f"ratio=${t / direct}%.2f " +
        f"conc=${sys.env.getOrElse("GRAFT_CKPT_CONCURRENCY", "12")} " +
        f"maxChunks=${sys.env.getOrElse("GRAFT_CKPT_MAXCHUNKS", "64")}")
      // scalastyle:on println
    }
    s.stop()
  }
}
