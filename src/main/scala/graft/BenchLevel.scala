package graft

import scala.jdk.CollectionConverters._

/** Per-rep host/JVM telemetry: wall time alone cannot distinguish a
  * code regression from a noisy shared host. Each rep records the
  * JVM's GC wall delta and the host's `/proc/stat` steal + busy
  * deltas over the rep's interval — a slow rep with steal ≫ 0 is the
  * hypervisor's fault; a slow rep with flat steal and ballooning GC
  * is the JVM's. */
object BenchTelemetry {
  final case class Cpu(total: Long, steal: Long, idle: Long)

  /** @param heapPeakMb max heap-pool usage observed during the rep
    *   (pool peaks reset at rep start) — how close the allocation
    *   rate pushes the heap to its cap
    * @param heapAfterGcMb heap used after the post-rep full GC — the
    *   LIVE set; near-cap values mean GC pauses are memory pressure,
    *   not allocation-rate noise */
  final case class Rep(wall: Double, gcMs: Long, stealPct: Double,
      busyPct: Double, heapPeakMb: Long = -1, heapAfterGcMb: Long = -1)

  def heapUsedMb(): Long =
    java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed >> 20

  def heapMaxMb(): Long =
    java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getMax >> 20

  private def heapPools =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)

  def resetHeapPeaks(): Unit =
    try heapPools.foreach(_.resetPeakUsage())
    catch { case scala.util.control.NonFatal(_) => () }

  def heapPeakMb(): Long =
    try heapPools.map(_.getPeakUsage.getUsed).sum >> 20
    catch { case scala.util.control.NonFatal(_) => -1L }

  def cpu(): Option[Cpu] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val line = try src.getLines().next() finally src.close()
      // cpu user nice system idle iowait irq softirq steal ...
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      val steal = if (f.length > 7) f(7) else 0L
      val idle = f(3) + (if (f.length > 4) f(4) else 0L)
      Some(Cpu(f.sum, steal, idle))
    } catch { case scala.util.control.NonFatal(_) => None }

  def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  /** Run `body`, returning its wall seconds plus the interval's GC,
    * host-CPU and heap-peak deltas. `heapAfterGcMb` stays unset —
    * callers fill it via [[afterGc]] once they've released caches and
    * forced a full GC, so it measures the true live set. */
  def timed(body: => Unit): Rep = {
    resetHeapPeaks()
    val c0 = cpu(); val g0 = gcMillis(); val t0 = System.nanoTime()
    body
    val wall = (System.nanoTime() - t0) / 1e9
    val gc = gcMillis() - g0
    val peak = heapPeakMb()
    val (steal, busy) = (for (a <- c0; b <- cpu()) yield {
      val dt = math.max(1L, b.total - a.total)
      (100.0 * (b.steal - a.steal) / dt,
        100.0 * ((b.total - b.idle) - (a.total - a.idle)) / dt)
    }).getOrElse((-1.0, -1.0))
    Rep(wall, gc, steal, busy, peak)
  }

  /** Stamp the post-drain post-full-GC live set onto a rep. */
  def afterGc(r: Rep): Rep = r.copy(heapAfterGcMb = heapUsedMb())

  def json(r: Rep): String =
    f"""{"wall":${r.wall}%.3f,"gc_ms":${r.gcMs},""" +
      f""""steal_pct":${r.stealPct}%.2f,"busy_pct":${r.busyPct}%.2f,""" +
      f""""heap_peak_mb":${r.heapPeakMb},""" +
      f""""heap_after_gc_mb":${r.heapAfterGcMb}}"""

  def jsonArr(rs: Seq[Rep]): String =
    rs.map(json).mkString("[", ",", "]")
}

/** Child-JVM entry for one bench parallelism level (see
  * [[Bench.runLevel]]): cold first run + `reps` warm repeats with
  * per-rep telemetry, emitted as a single machine-readable stdout
  * line. The parent launches SEVERAL short-lived instances of this
  * per level instead of one long-lived one, so nothing (heap aging,
  * block-manager growth, page-cache pressure) can accumulate across
  * more than a couple of reps — monotonic in-JVM degradation is
  * structurally impossible to mistake for steady state. */
object BenchLevel {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val root = args(1)
    val reps = args(2).toInt
    val s = Bench.session(cores)
    def rep() = {
      val r = BenchTelemetry.timed { Bench.runWorkload(s, root); () }
      // release anything an operator registered + nudge the
      // ContextCleaner's reference queue between reps
      graft.engine.Caches.drain(s)
      System.gc()
      BenchTelemetry.afterGc(r)
    }
    val cold = rep()
    val warm = (1 to reps).map(_ => rep())
    s.stop()
    // scalastyle:off println
    println("BENCHLEVEL" +
      s"""{"heap_max_mb":${BenchTelemetry.heapMaxMb()},""" +
      s""""cold":${BenchTelemetry.json(cold)},""" +
      s""""reps":${BenchTelemetry.jsonArr(warm)}}""")
    // scalastyle:on println
  }
}

/** Child-JVM entry for the per-path comparison: direct zonal vs the
  * checkpointed (resumable) path vs the sliver-fallback pass, all at
  * local[32]. The direct/checkpointed reps are INTERLEAVED
  * (D C D C D C) so host-load drift during the measurement hits both
  * paths equally — the ratio is then meaningful even on a noisy
  * host, which is the number the round-2/3 bar (ckpt ≤ 1.2× direct)
  * actually needs. */
object BenchPaths {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val pairs = if (args.length > 1) args(1).toInt else 3
    val s = Bench.session(32)
    def t(body: => Unit) = {
      val r = BenchTelemetry.timed(body)
      graft.engine.Caches.drain(s)
      System.gc()
      BenchTelemetry.afterGc(r)
    }
    val warmup = t { Bench.runZonalOnly(s, root); () }
    val direct = scala.collection.mutable.ArrayBuffer
      .empty[BenchTelemetry.Rep]
    val ckpt = scala.collection.mutable.ArrayBuffer
      .empty[BenchTelemetry.Rep]
    for (_ <- 1 to pairs) {
      direct += t { Bench.runZonalOnly(s, root); () }
      ckpt += t { Bench.runCheckpointed(s, root); () }
    }
    val fallback = (1 to pairs).map(_ =>
      t { Bench.runFallbackSliver(s, root); () })
    // incremental growth path: fold the appended 10% delta into the
    // saved v1 stats — compared against the direct reps above (same
    // child JVM, so the incremental/direct ratio is drift-robust)
    Bench.ensureIncrTable(s, root)
    val incr = (1 to pairs).map(_ =>
      t { Bench.runIncrementalUpdate(s, root); () })
    s.stop()
    // scalastyle:off println
    println("BENCHPATHS" +
      s"""{"warmup":${BenchTelemetry.json(warmup)},""" +
      s""""direct":${BenchTelemetry.jsonArr(direct.toSeq)},""" +
      s""""ckpt":${BenchTelemetry.jsonArr(ckpt.toSeq)},""" +
      s""""fallback":${BenchTelemetry.jsonArr(fallback)},""" +
      s""""incr":${BenchTelemetry.jsonArr(incr)}}""")
    // scalastyle:on println
  }
}
