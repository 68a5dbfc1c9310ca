package graft.tools
import graft.Bench
import graft.operators._
import graft.sources.TileTable
import org.apache.spark.scheduler._
import scala.collection.mutable
object Prof3 {
  class L extends SparkListener {
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Int)]
    val taskTime = mutable.HashMap.empty[Int, Long].withDefaultValue(0L)
    val gcTime = mutable.HashMap.empty[Int, Long].withDefaultValue(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      taskTime(t.stageId) += t.taskInfo.duration
      gcTime(t.stageId) += t.taskMetrics.jvmGCTime
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      val i = s.stageInfo
      stages += ((i.stageId, i.name.take(40),
        i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
        taskTime(i.stageId), i.numTasks))
      println(f"[prof3] stage ${i.stageId}%3d ${i.name.take(38)}%-38s wall=${(i.completionTime.getOrElse(0L)-i.submissionTime.getOrElse(0L))/1000.0}%7.2fs taskSum=${taskTime(i.stageId)/1000.0}%8.2fs gc=${gcTime(i.stageId)/1000.0}%6.2fs tasks=${i.numTasks}")
    }
  }
  def main(args: Array[String]): Unit = {
    val root = "/root/repo/data/bench_tiles"
    Bench.ensureBenchTable(root)
    val spark = Bench.session(32)
    spark.sparkContext.addSparkListener(new L)
    val table = TileTable.open(root)
    val zones = Bench.benchZones(table.grid)
    // warmup
    ZonalEngine.run(spark, table.read(spark), zones, table.grid, table.nodata).count()
    println("[prof3] ===== measured run =====")
    val t0 = System.nanoTime()
    ZonalEngine.run(spark, table.read(spark), zones, table.grid, table.nodata).count()
    println(f"[prof3] total ${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
