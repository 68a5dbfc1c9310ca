package graft.tools

/** Dev probe: warm end-to-end reps of the two benched minhash
  * queries, exactly as the bench invokes them. */
object ProfClusters2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Bench.session(32)
    for (name <- Seq("q_minhash_lsh", "q_minhash_clusters"); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, sf).count()
      System.err.println(
        f"PROF $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      graft.engine.Caches.drain(s)
    }
    s.stop()
  }
}
