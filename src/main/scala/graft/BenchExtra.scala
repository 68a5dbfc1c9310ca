package graft

/** Extra benchmarks for the optimization rounds (guide §1.4): NOT part
  * of the frozen driver contract — `graft.Bench` stays the measured
  * artifact; this main exists so before/after numbers for individual
  * operators can be taken with the SAME methodology (cold rep, then
  * warm reps with `Caches.drain` + full GC between, per-rep
  * GC/steal/heap telemetry) without re-running the whole bench.
  *
  * Usage: runMain graft.BenchExtra [mode] [args...]
  *
  *   queries [sfDir] [q1,q2,...] [warmReps] [cores]
  *     cold + warm `.count()` reps per query (the Bench query loop's
  *     exact action), one JSON line per query on stdout.
  *   zonal [root] [reps] [cores]
  *     the Bench zonal+overlap workload with SPARK_GRAFT_BENCH_PHASES
  *     honored, one JSON line per rep.
  */
object BenchExtra {
  private val DefaultQueries = Seq("q_zonal_basic", "q_token_stats",
    "q_embed_topk", "q_agg_pricing", "q_minhash_lsh",
    "q_minhash_clusters", "q_minhash_incr")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("queries")
    mode match {
      case "queries" =>
        val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val qs = if (args.length > 2 && args(2).nonEmpty)
          args(2).split(",").toSeq else DefaultQueries
        val reps = if (args.length > 3) args(3).toInt else 3
        val cores = if (args.length > 4) args(4).toInt else 32
        val s = Bench.session(cores)
        for (name <- qs) {
          val fn = SparkEntry.queries(name)
          val tc = System.nanoTime()
          fn(s, sf).count()
          val cold = (System.nanoTime() - tc) / 1e9
          graft.engine.Caches.drain(s)
          val rs = (1 to reps).map { _ =>
            val r = BenchTelemetry.timed { fn(s, sf).count(); () }
            graft.engine.Caches.drain(s)
            System.gc()
            BenchTelemetry.afterGc(r)
          }
          println(f"""BENCHX {"query":"$name","cold":$cold%.3f,""" +
            f""""median":${Bench.median(rs.map(_.wall))}%.3f,""" +
            s""""reps":${BenchTelemetry.jsonArr(rs)}}""")
        }
        s.stop()
      case "plans" =>
        // write .explain("formatted") of each query to
        // plans/r08/<q>_<tag>.txt (one warm-up run first so AQE
        // finalizes and fixtures exist)
        val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val qs = if (args.length > 2 && args(2).nonEmpty)
          args(2).split(",").toSeq else DefaultQueries
        val tag = if (args.length > 3) args(3) else "before"
        val dir = java.nio.file.Paths.get("plans/r08")
        java.nio.file.Files.createDirectories(dir)
        val s = Bench.session(32)
        for (name <- qs) {
          val fn = SparkEntry.queries(name)
          fn(s, sf).count() // warm-up
          val df = fn(s, sf)
          df.count()
          java.nio.file.Files.writeString(
            dir.resolve(s"${name}_$tag.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          System.err.println(s"[plans] wrote ${name}_$tag.txt")
        }
        s.stop()
      case "jobs" =>
        // per-Spark-job wall breakdown of ONE warm query execution:
        // job wall, task count, summed task time — tells driver/plan
        // latency apart from executor work for job-round-bound queries
        val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val name = if (args.length > 2) args(2) else "q_minhash_incr"
        val cores = if (args.length > 3) args(3).toInt else 32
        val s = Bench.session(cores)
        // the pseudo-query "bench_zonal" profiles the bench workload
        // itself (Bench.runWorkload on the bench table; `sf` is then
        // the table root)
        val run: () => Unit =
          if (name == "bench_zonal") {
            Bench.ensureBenchTable(sf)
            () => { Bench.runWorkload(s, sf); () }
          } else {
            val q = SparkEntry.queries(name)
            () => { q(s, sf).count(); () }
          }
        run() // warm-up
        graft.engine.Caches.drain(s)
        val stages = new java.util.concurrent.ConcurrentHashMap[Int,
          (String, Int, Long)]() // id -> (name, nTasks, wall)
        // task durations accumulate in their own map: tasks finish
        // BEFORE SparkListenerStageCompleted fires, so folding them
        // into the stage entry let the completion event zero them out
        val taskMs = new java.util.concurrent.ConcurrentHashMap[Int,
          java.util.concurrent.atomic.AtomicLong]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val desc = Option(j.properties)
              .flatMap(p => Option(p.getProperty(
                "spark.job.description"))).getOrElse("")
            println(s"JOB ${j.jobId} stages=" +
              j.stageInfos.map(_.stageId).sorted.mkString(",") +
              s" rdd0=${j.stageInfos.headOption.map(_.name.linesIterator.next()).getOrElse("")}" +
              (if (desc.nonEmpty) s" desc=$desc" else ""))
          }
          override def onStageCompleted(
              e: org.apache.spark.scheduler
                .SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val wall = (for (a <- si.submissionTime;
              b <- si.completionTime) yield b - a).getOrElse(-1L)
            stages.put(si.stageId, (si.name.linesIterator.next(),
              si.numTasks, wall))
          }
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val d = if (t.taskInfo != null) t.taskInfo.duration else 0L
            taskMs.computeIfAbsent(t.stageId,
              _ => new java.util.concurrent.atomic.AtomicLong())
              .addAndGet(d)
          }
        }
        s.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        run()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(_._1)
        def tms(id: Int): Long =
          Option(taskMs.get(id)).map(_.get()).getOrElse(0L)
        rows.foreach { case (id, (nm, n, w)) =>
          println(f"STAGE $id%3d wall=${w / 1e3}%7.3f s tasks=$n%4d " +
            f"taskSum=${tms(id) / 1e3}%8.3f s  $nm%.90s")
        }
        println(f"TOTAL query=$wall%.3f s " +
          f"taskSum=${rows.map(r => tms(r._1)).sum / 1e3}%.3f s " +
          s"nStages=${rows.size}")
        s.stop()
      case "zonal" =>
        val root = if (args.length > 1) args(1)
          else "/root/repo/data/bench_tiles"
        val reps = if (args.length > 2) args(2).toInt else 3
        val cores = if (args.length > 3) args(3).toInt else 32
        Bench.ensureBenchTable(root)
        val s = Bench.session(cores)
        (0 to reps).foreach { i =>
          val r = BenchTelemetry.timed {
            val w = Bench.runWorkload(s, root); ()
          }
          System.gc()
          val tag = if (i == 0) "cold" else s"warm$i"
          println(s"""BENCHX {"zonal_overlap_p$cores":"$tag",""" +
            BenchTelemetry.json(BenchTelemetry.afterGc(r)).drop(1))
        }
        s.stop()
      case other => sys.error(s"unknown mode $other")
    }
  }
}
