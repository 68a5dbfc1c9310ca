ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "zonal_stats_toolkitspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes through unprefixed (no sbt [info] tag) so
// machine-readable stdout lines (Bench's JSON) parse downstream.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Let AQE re-optimize (coalesce) the output partitioning of CACHED
  // plans: the dedup operators persist dimension-sized frames (sig,
  // members, tokSets) that are consumed by many union branches/join
  // sides, and with the default=false every such cache pins the full
  // spark.sql.shuffle.partitions layout — each consumer stage then
  // runs shuffle.partitions near-empty tasks per branch. Scale-neutral
  // (it ADAPTS to stats rather than encoding local core counts).
  "-Dspark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true",
  // Spark 4.1 writes a paired checksum file for EVERY streaming state
  // checkpoint file, and every state-store commit synchronously awaits
  // that second write through a small fixed pool
  // (ChecksumCheckpointFileManager.awaitResult — thread dumps show all
  // 64 state tasks of each micro-batch parked there; q_stream_sigdedup
  // spent 0.58 s/task on ~10-row state partitions, 16 s/run). The
  // sandbox's local-disk checkpoints gain nothing from double-write
  // integrity files (object stores checksum server-side; local disks
  // have ECC), so keep 4.0 semantics. Scale-neutral: the cost removed
  // is a fixed per-(task × batch) fsync round-trip, worst exactly
  // where state partitions outnumber state rows.
  "-Dspark.sql.streaming.checkpoint.fileChecksum.enabled=false",
  // The default FileContext-based checkpoint manager is symlink-aware:
  // on the local filesystem every getFileStatus FORKS a `readlink`
  // shell process (RawLocalFileSystem.deprecatedGetFileLinkStatusInternal
  // — thread dumps show state tasks runnable in ProcessImpl.forkAndExec),
  // thousands of forks per streaming run. The FileSystem-based manager
  // stats files in-process; rename atomicity is identical on
  // POSIX/HDFS (object-store deployments configure their own manager
  // per store, as upstream docs describe).
  "-Dspark.sql.streaming.checkpointFileManagerClass=" +
    "org.apache.spark.sql.execution.streaming.checkpointing." +
    "FileSystemBasedCheckpointFileManager",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // image decode allocates heavily across 32 executor threads;
  // ParallelGC sustains ~2x the allocation throughput of G1 here
  "-XX:+UseParallelGC",
)
