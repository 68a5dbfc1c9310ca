package graft

/** Child-JVM entry for one bench parallelism level (see
  * [[Bench.runLevel]]): cold first run + median of warm repeats,
  * emitted as a single machine-readable stdout line. */
object BenchLevel {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val root = args(1)
    val reps = args(2).toInt
    val s = Bench.session(cores)
    val cold = Bench.runWorkload(s, root)
    val warm = (1 to reps).map(_ => Bench.runWorkload(s, root))
    s.stop()
    // scalastyle:off println
    println(s"""BENCHLEVEL{"cold":$cold,"median":${Bench.median(warm)},""" +
      s""""reps":[${warm.mkString(",")}]}""")
    // scalastyle:on println
  }
}
