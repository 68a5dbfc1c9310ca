package graft

import graft.engine.{Config, ZonalJob}
import org.apache.spark.sql.SparkSession

import java.nio.file.Paths
import java.time.format.DateTimeFormatter

/** spark-submit entrypoint: INI config → validated jobs → zonal-stats
  * CSVs — the engine's `main` (`/root/reference/runner.py:1054-1106`).
  * Job outputs are timestamped `%Y_%m_%d_%H_%M_%S` like the reference;
  * pass `--no-timestamp` for byte-stable output names.
  *
  *   spark-submit --class graft.Main <jar> <config.ini> [--no-timestamp]
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.ini> [--no-timestamp]")
    val cfg = Config.parseAndValidate(Paths.get(args(0)))
    val noTs = args.contains("--no-timestamp")

    // spark-submit injects spark.master; default to local[*] when run
    // directly (e.g. sbt runMain)
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master",
        sys.env.getOrElse("SPARK_MASTER", "local[*]")))
      .appName(s"graft-${cfg.name}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // log4j honors all python-logging-style levels; map 1:1 instead
    // of coercing (DEBUG really turns on Spark DEBUG logging)
    spark.sparkContext.setLogLevel(cfg.logLevel match {
      case "DEBUG" => "DEBUG"
      case "INFO" => "INFO"
      case "WARN" | "WARNING" => "WARN"
      case "ERROR" => "ERROR"
      case l if l.startsWith("CRIT") || l.startsWith("FATAL") => "ERROR"
      case _ => "WARN"
    })

    val ts =
      if (noTs) None
      else Some(java.time.LocalDateTime.now()
        .format(DateTimeFormatter.ofPattern("yyyy_MM_dd_HH_mm_ss")))

    // Jobs are independent — submit them all concurrently, the
    // TaskGraph analogue (`runner.py:1075-1076` uses
    // n_workers = len(jobs)+1, i.e. every job in flight at once);
    // Spark's scheduler interleaves the resulting jobs. Each raster
    // inside a job checkpoints per chunk, so a killed run resumes.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, cfg.jobs.size))
    try {
      val futs = cfg.jobs.map { job =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String = {
            val out = ZonalJob.run(spark, job, ts)
            // scalastyle:off println
            println(s"[graft] job ${job.tag} -> $out")
            // scalastyle:on println
            out
          }
        })
      }
      futs.foreach(_.get()) // propagate the first failure
    } finally pool.shutdownNow()
    spark.stop()
  }
}
