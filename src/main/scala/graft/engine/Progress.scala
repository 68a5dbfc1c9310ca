package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Live progress/metrics listener — the Spark-native analogue of the
  * reference's throttled progress callbacks
  * (`/root/reference/runner.py:41-84,510-528,1028-1051`): the reference
  * wraps long GDAL calls in a callback that logs percent-complete at
  * most once per interval. On Spark the equivalent signal is stage
  * completion, so this listener appends one JSON line per completed
  * stage (throttled to `minIntervalMs`) with cumulative task/record
  * counters, and always writes a final `summary` line on detach — the
  * machine-readable progress feed that lineage.json complements
  * post-hoc.
  */
final class ProgressListener(path: String, minIntervalMs: Long)
    extends SparkListener {
  private val mapper = new ObjectMapper()
  private var lastEmit = 0L
  private var stages = 0L
  private var tasks = 0L
  private var records = 0L
  private var bytes = 0L

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    synchronized {
      val info = e.stageInfo
      // a retried stage fires completion once per attempt: count only
      // SUCCESSFUL attempts (a failed attempt carries partial metrics
      // and its successful retry carries the real ones), so cumulative
      // records/bytes are neither double-counted nor under-reported
      if (info.failureReason.isDefined) return
      stages += 1
      tasks += info.numTasks
      val m = info.taskMetrics
      if (m != null) {
        records += m.inputMetrics.recordsRead
        bytes += m.inputMetrics.bytesRead
      }
      val now = System.nanoTime() / 1000000L
      if (now - lastEmit >= minIntervalMs) {
        lastEmit = now
        emit("stage", Some(info.stageId), Some(info.name))
      }
    }

  /** Unthrottled summary; call when the tracked job finishes. */
  def summary(): Unit = synchronized { emit("summary", None, None) }

  private[engine] def snapshotStages: Long = synchronized(stages)

  private def emit(kind: String, stageId: Option[Int],
      name: Option[String]): Unit = {
    val o = mapper.createObjectNode()
    o.put("kind", kind)
    stageId.foreach(o.put("stageId", _))
    name.foreach(n => o.put("stage", n.take(120)))
    o.put("stagesDone", stages)
    o.put("tasksDone", tasks)
    o.put("recordsRead", records)
    o.put("bytesRead", bytes)
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path),
      (mapper.writeValueAsString(o) + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}

object Progress {
  /** Attach a progress feed at `path` (JSONL). Returns the listener;
    * call [[detach]] when done to emit the summary line and unhook. */
  def attach(spark: SparkSession, path: String,
      minIntervalMs: Long = 2000L): ProgressListener = {
    val l = new ProgressListener(path, minIntervalMs)
    spark.sparkContext.addSparkListener(l)
    l
  }

  def detach(spark: SparkSession, l: ProgressListener): Unit = {
    // stage-completed events arrive async on the listener bus (no
    // public drain API) — wait until the counters stabilize briefly
    var prev = -1L
    var settled = 0
    var waited = 0
    while (settled < 2 && waited < 2000) {
      val cur = l.snapshotStages
      if (cur == prev) settled += 1 else { settled = 0; prev = cur }
      Thread.sleep(50); waited += 50
    }
    l.summary()
    spark.sparkContext.removeSparkListener(l)
  }
}
