package graft.engine

import org.apache.spark.sql.SparkSession

/** Session-scoped registry for cached intermediates whose consumers
  * materialize OUTSIDE the operator that cached them (e.g. the
  * MinHash token-hash cache feeding a result the caller streams out —
  * the operator cannot know when the caller is done with the plan).
  *
  * Operators register a release closure at persist time; loop-shaped
  * callers (benches, services, the driver's per-query harness) call
  * [[drain]] between iterations so a long-lived session never
  * accumulates block-manager entries waiting for the ContextCleaner
  * (which under ParallelGC + a large heap may never run). Draining is
  * idempotent and safe at any point: releasing a persist early only
  * costs recompute, never correctness.
  *
  * Operators whose results ARE dimension-sized (the zonal rollup)
  * don't use this — they materialize eagerly and release inline
  * (see [[graft.operators.ZonalEngine.finishStats]]).
  */
object Caches {
  /** Cap on pending releases per session: a caller that never drains
    * (and would previously have leaked through the ContextCleaner
    * anyway) has its OLDEST cache released on overflow instead of the
    * registry itself pinning an unbounded set of persisted frames —
    * the registry must never leak harder than the leak it fixes.
    * Releasing early only costs recompute. */
  val MaxPending = 8

  private val reg = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.Queue[() => Unit]]()

  def register(spark: SparkSession, release: () => Unit): Unit = {
    val q = reg.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]())
    q.add(release)
    while (q.size() > MaxPending) {
      val r = q.poll()
      if (r != null)
        try r() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Release everything registered against `spark`. */
  def drain(spark: SparkSession): Unit = {
    val q = reg.remove(spark)
    if (q != null) {
      var r = q.poll()
      while (r != null) {
        try r() catch { case scala.util.control.NonFatal(_) => () }
        r = q.poll()
      }
    }
  }

  /** Number of pending releases (test hook). */
  def pending(spark: SparkSession): Int = {
    val q = reg.get(spark)
    if (q == null) 0 else q.size()
  }
}
