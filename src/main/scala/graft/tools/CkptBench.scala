package graft.tools

/** Ad-hoc probe: checkpointed-path wall time at the bench table under
  * the current GRAFT_CKPT_CONCURRENCY env. */
object CkptBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val s = graft.Bench.session(32)
    val direct = graft.Bench.runWorkload(s, "/root/repo/data/bench_tiles")
    (1 to reps).foreach { _ =>
      val t = graft.Bench.runCheckpointed(s, "/root/repo/data/bench_tiles")
      // scalastyle:off println
      println(f"CKPT $t%.2f s direct=$direct%.2f s " +
        f"conc=${sys.env.getOrElse("GRAFT_CKPT_CONCURRENCY", "12")}")
      // scalastyle:on println
    }
    s.stop()
  }
}
