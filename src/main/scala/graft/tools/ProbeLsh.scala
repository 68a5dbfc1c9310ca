package graft.tools

/** Dev probe: q_minhash_lsh cardinalities at a given sfDir. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Bench.session(32)
    val docs = s.read.parquet(s"$sf/documents.parquet")
    println(s"PROBE docs=${docs.count()}")
    val keyed = docs.selectExpr("doc_id",
      "md5(concat_ws(' ', sort_array(array_distinct(split(trim(text), '\\\\s+'))))) AS ckey")
    println(s"PROBE distinct_contents=${keyed.select("ckey").distinct().count()}")
    val out = graft.engine.DataQueries.minhashLsh(s, sf)
    val t0 = System.nanoTime()
    println(s"PROBE pairs=${out.count()} in ${(System.nanoTime()-t0)/1e9}s")
    s.stop()
  }
}
