package graft.tools

/** Dev probe: physical plan of q_minhash_lsh — which join
  * strategies does Spark pick without persisted stats? */
object ProfLsh7 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Bench.session(32)
    val q = graft.engine.DataQueries.minhashLsh(s, sf)
    // executed-plan view: run it, then print the final AQE plan
    q.count()
    System.err.println(q.queryExecution.executedPlan.toString.take(12000))
    s.stop()
  }
}
