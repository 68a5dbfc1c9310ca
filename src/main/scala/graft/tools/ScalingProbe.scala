package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Attribution probe for the 8→32 thread-scaling gap (the round-6
  * verdict's top task): WHICH resource stops the box from scaling the
  * zonal workload past 8 cores — the engine (scheduling gaps, stage
  * tails, driver serialization) or the host (shared memory system /
  * per-core frequency)?
  *
  * Three raw-thread control sweeps (no Spark anywhere — plain
  * `java.lang.Thread`s, so neither scheduler nor shuffle can be the
  * cause) bracket the hardware:
  *
  *   alu     xorshift64 in registers — a working set of ONE long.
  *           Scales with frequency/steal only; any fall-off here is
  *           the host (hypervisor steal, frequency scaling), full
  *           stop.
  *   stream  per-thread 32 MB long-array sum — DRAM-bandwidth bound.
  *           The classic shared-memory-system ceiling.
  *   decode  the engine's actual gray16 PNG decode (Inflater +
  *           unfilter + sample swap) on the bench tile payload — the
  *           hot kernel of the zonal workload, between the two
  *           extremes (zlib is compute + a few-hundred-KB working
  *           set).
  *
  * plus `spark <root> <cores>`: the UNMODIFIED zonal+overlap bench
  * workload under a stage listener, reporting per-stage task-time
  * occupancy (Σ task runtime / (stage wall × cores)), straggler
  * tails (max/p95 task), scheduler delay, GC, and the wall fraction
  * covered by no running stage (= driver-side time). Comparing p8 vs
  * p32 occupancy tells whether Spark leaves cores idle; the raw
  * sweeps tell what busy cores are worth at each level.
  *
  * Usage: runMain graft.tools.ScalingProbe raw
  *        runMain graft.tools.ScalingProbe spark <tableRoot> <cores>
  * Each prints one SCALINGPROBE{...} JSON line (the bench child-JVM
  * convention) for SCALING.md to cite.
  */
object ScalingProbe {

  /** threads → aggregate ops/s for `work(seed, iters)` run on every
    * thread; per-thread JIT warm-up included. */
  private def sweep(threads: Seq[Int], iters: Long)(
      work: (Long, Long) => Long): Seq[(Int, Double)] = {
    def run(t: Int, n: Long): Double = {
      val sink = new AtomicLong()
      val ts = (0 until t).map(i => new Thread(() => {
        sink.addAndGet(work(0x9E3779B97F4A7C15L * (i + 1), n))
      }))
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      require(sink.get != 42, "sink") // keep the work alive
      t * n / dt
    }
    run(4, iters) // JIT warm-up
    // best-of-2 per level: a momentary steal burst can halve one
    // short measurement; the max is the host's demonstrated capacity
    threads.map(t => (t, math.max(run(t, iters), run(t, iters))))
  }

  private def aluWork(seed: Long, n: Long): Long = {
    var x = seed | 1L; var i = 0L
    while (i < n) { // xorshift64: registers only
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
    }
    x
  }

  private val StreamWords = (32 << 20) / 8 // 32 MB per thread

  private def streamWork(seed: Long, n: Long): Long = {
    val a = new Array[Long](StreamWords)
    var i = 0
    while (i < a.length) { a(i) = seed + i; i += 1 }
    var acc = 0L; var pass = 0L
    while (pass < n) { // n passes over 32 MB — DRAM resident
      var j = 0
      while (j < a.length) { acc += a(j); j += 1 }
      pass += 1
    }
    acc
  }

  private def jsonPairs(xs: Seq[(Int, Double)]): String =
    xs.map { case (t, v) => s""""$t":${v.round}""" }.mkString("{", ",", "}")

  /** 8→32 efficiency of a sweep: thr(32) / (4 × thr(8)). */
  private def eff832(xs: Seq[(Int, Double)]): Double = {
    val m = xs.toMap
    (m(32) / (4 * m(8)) * 1000).round / 1000.0
  }

  private def rawMain(): Unit = {
    val threads = Seq(1, 2, 4, 8, 16, 24, 32)
    val alu = sweep(threads, 800_000_000L)(aluWork)
    val stream = sweep(threads, 250L)(streamWork)
    // decode: the engine's own PNG kernel on bench-grid payloads
    val grid = graft.Bench.benchGrid
    val pngs = (0 until 64).map(i => graft.functions.ImageCodec
      .encodePng(graft.synth.Synth.tilePixels(grid, i / 8, i % 8),
        grid.tileW, grid.tileH)).toArray
    val decode = sweep(threads, 8000L) { (seed, n) =>
      var i = 0L; var acc = 0L
      while (i < n) {
        val px = graft.functions.ImageCodec.decodePng(
          pngs(((seed + i) % pngs.length).toInt.abs))
        acc += px((i % px.length).toInt).toLong
        i += 1
      }
      acc
    }
    // scalastyle:off println
    println("SCALINGPROBE" +
      s"""{"mode":"raw","threads":[${threads.mkString(",")}],""" +
      s""""alu_ops_s":${jsonPairs(alu)},""" +
      s""""stream_sums_s":${jsonPairs(stream)},""" +
      s""""decode_tiles_s":${jsonPairs(decode)},""" +
      s""""eff_8_32":{"alu":${eff832(alu)},"stream":${eff832(stream)},""" +
      s""""decode":${eff832(decode)}}}""")
    // scalastyle:on println
  }

  /** Per-stage aggregate from the listener. */
  private final case class StageAgg(stageId: Int, name: String,
      tasks: Int, wallMs: Long, taskTimeMs: Long, gcMs: Long,
      deserMs: Long, maxTaskMs: Long, p95TaskMs: Long,
      submitted: Long, completed: Long)

  private def sparkMain(root: String, cores: Int): Unit = {
    val s = graft.Bench.session(cores)
    import org.apache.spark.scheduler._
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageAgg]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val q = taskMs.computeIfAbsent(e.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
        if (e.taskMetrics != null) q.add(e.taskMetrics.executorRunTime)
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val times = Option(taskMs.get(si.stageId))
          .map(q => { val b = Seq.newBuilder[Long]
            q.forEach(t => b += t); b.result().sorted })
          .getOrElse(Nil)
        val sub = si.submissionTime.getOrElse(0L)
        val comp = si.completionTime.getOrElse(0L)
        stages.add(StageAgg(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, comp - sub,
          if (m != null) m.executorRunTime else 0L,
          if (m != null) m.jvmGCTime else 0L,
          if (m != null) m.executorDeserializeTime else 0L,
          times.lastOption.getOrElse(0L),
          if (times.isEmpty) 0L else times((times.size - 1) * 95 / 100),
          sub, comp))
      }
    }
    graft.Bench.runWorkload(s, root) // warm-up (JIT + AQE), unlistened
    s.sparkContext.addSparkListener(listener)
    val t0 = System.currentTimeMillis()
    val wall = graft.Bench.runWorkload(s, root)
    val t1 = System.currentTimeMillis()
    s.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // listener bus drain
    val ss = { val b = Seq.newBuilder[StageAgg]
      stages.forEach(a => b += a); b.result().sortBy(_.stageId) }
    val totalTaskMs = ss.map(_.taskTimeMs).sum
    val occupancy = totalTaskMs.toDouble / ((t1 - t0) * cores)
    // wall not covered by ANY running stage = driver-side time
    // (planning, AQE, collect/finishStats, job gaps)
    val events = ss.flatMap(a => Seq((a.submitted, 1), (a.completed, -1)))
      .sortBy(x => (x._1, -x._2))
    var depth = 0; var covered = 0L; var last = t0
    events.foreach { case (t, d) =>
      if (depth > 0) covered += (t max last) - last
      last = t max last; depth += d
    }
    val uncovered = (t1 - t0) - covered
    val stageJson = ss.map(a =>
      s"""{"id":${a.stageId},"tasks":${a.tasks},"wall_ms":${a.wallMs},""" +
      s""""task_ms":${a.taskTimeMs},"gc_ms":${a.gcMs},""" +
      s""""deser_ms":${a.deserMs},"max_task_ms":${a.maxTaskMs},""" +
      s""""p95_task_ms":${a.p95TaskMs},""" +
      s""""occ":${(a.taskTimeMs.toDouble /
        (a.wallMs.max(1) * cores) * 1000).round / 1000.0},""" +
      s""""name":"${a.name.replace('"', '\'')}"}""").mkString("[", ",", "]")
    s.stop()
    // scalastyle:off println
    println("SCALINGPROBE" +
      s"""{"mode":"spark","cores":$cores,"wall_s":$wall,""" +
      s""""total_task_s":${totalTaskMs / 1000.0},""" +
      s""""occupancy":${(occupancy * 1000).round / 1000.0},""" +
      s""""driver_uncovered_ms":$uncovered,""" +
      s""""stages":$stageJson}""")
    // scalastyle:on println
  }

  def main(args: Array[String]): Unit = args.headOption.getOrElse("raw") match {
    case "raw" => rawMain()
    case "spark" => sparkMain(args(1), args(2).toInt)
    case m => sys.error(s"unknown mode '$m' (raw | spark <root> <cores>)")
  }
}
