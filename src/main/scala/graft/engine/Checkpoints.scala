package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.XXHash64
import graft.geom.{Zone, ZoneIndex}
import graft.operators.{ZonalEngine, ZonalStats}
import graft.sources.{TileFileStat, TileManifest, TileTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Chunked, resumable zonal-stats execution — the engine's answer to
  * the reference's TaskGraph memoization (`/root/reference/
  * runner.py:1093-1098`) and the north rule's "resumable from
  * checkpoint with per-partition lineage + metrics".
  *
  * A chunk is a CONTIGUOUS GROUP of the tile table's cell-sorted
  * manifest files (not one file): with a 10^5–10^6-file manifest, one
  * Spark job per file would serialize the cluster behind driver
  * round-trips, so files are grouped into at most `maxChunks` jobs,
  * each wide enough to saturate cluster parallelism while keeping
  * checkpoint granularity. Each chunk writes its per-FID partial stats
  * to `<ckptDir>/chunk=<i>/` together with a `lineage.json` recording
  * the chunk's file list, input fingerprint, per-partition row/pixel
  * counts and wall time. A restarted run skips every chunk whose
  * lineage exists AND whose fingerprint matches the current inputs
  * (zone set, file stats, flags) — a stale or foreign checkpoint dir
  * is recomputed instead of silently merged. The final merge is a pure
  * reduction over chunk outputs, so interrupted runs resume to
  * byte-identical results. The kernel (decode + scanline assign) runs
  * exactly once per chunk: partials are persisted across the metrics
  * action and the parquet write.
  */
object Checkpoints {
  private val mapper = new ObjectMapper()

  /** Default chunk-count cap — shared with verification code that
    * re-derives chunk indices (keep in sync by REFERENCE, not copy). */
  val DefaultMaxChunks = 64

  def chunkDir(ckptDir: String, i: Int): String = f"$ckptDir/chunk=$i%05d"

  /** Group the manifest's cell-sorted files into at most `maxChunks`
    * contiguous chunks (spatially coherent because files are
    * cell-range sorted). */
  def chunkFiles(files: Seq[TileFileStat],
      maxChunks: Int): Seq[Seq[TileFileStat]] = {
    val n = math.min(math.max(1, maxChunks), math.max(1, files.size))
    if (files.isEmpty) Seq.empty
    else {
      val per = math.ceil(files.size.toDouble / n).toInt
      files.grouped(per).toSeq
    }
  }

  /** Digest of the CHUNK-INVARIANT inputs: the simplified zone set
    * (fid, group, geometry WKB), the table's grid geo-referencing,
    * nodata, SRS and band metadata, and the collectValues flag.
    * Computed once per run (the zone hash is O(zones) — doing it per
    * chunk would rebuild a multi-MB buffer chunks× times on the
    * driver); per-chunk fingerprints mix in only the file stats.
    * File pixel CONTENT is represented by the per-file
    * (path, cellMin, cellMax, rows) stats — rewriting a table in
    * place with identical stats defeats this (document: use a fresh
    * table root or ckptDir when regenerating data). */
  def contextDigest(zones: Seq[Zone], manifest: TileManifest,
      collectValues: Boolean): String = {
    val sb = new StringBuilder
    zones.foreach { z =>
      sb.append(z.fid).append('|').append(z.group).append('|')
        .append(XXHash64.hash(Zone.toWkb(z.geom))).append('\n')
    }
    sb.append(manifest.grid.toString).append('\n')
    sb.append(manifest.nodata).append('|')
      .append(manifest.srs).append('|')
      .append(manifest.bands.map(b => s"${b.band}:${b.nodata}")
        .mkString(",")).append('|')
    sb.append(collectValues)
    f"${XXHash64.hashString(sb.toString, 42L)}%016x"
  }

  /** Per-chunk fingerprint: context digest + this chunk's file stats.
    * Recorded in lineage.json; resume recomputes on mismatch. */
  def fingerprint(ctx: String, files: Seq[TileFileStat]): String = {
    val sb = new StringBuilder(ctx)
    files.foreach { f =>
      sb.append(f.path).append('|').append(f.cellMin).append('|')
        .append(f.cellMax).append('|').append(f.rows).append('\n')
    }
    f"${XXHash64.hashString(sb.toString, 42L)}%016x"
  }

  /** Existence-only check (lineage written atomically last). */
  def isChunkDone(ckptDir: String, i: Int): Boolean =
    Files.exists(Paths.get(chunkDir(ckptDir, i), "lineage.json"))

  /** Resume-safe check: lineage exists AND was produced from the same
    * inputs. */
  def isChunkDone(ckptDir: String, i: Int, expectedFp: String): Boolean =
    lineageField(ckptDir, i, "fingerprint").contains(expectedFp)

  /** Run the per-FID partial-stats stage chunk by chunk with
    * checkpointing; returns the merged fid-level stats DataFrame
    * (same shape as ZonalStats.fidStats) plus the number of chunks
    * actually (re)computed this run. */
  def chunkedFidStats(spark: SparkSession, table: TileTable,
      zones: Seq[Zone], ckptDir: String, runId: String,
      collectValues: Boolean = false,
      maxChunks: Int = DefaultMaxChunks): (DataFrame, Int) = {
    val idx = new ZoneIndex(zones.toArray)
    val bc = spark.sparkContext.broadcast(idx)
    val grid = table.grid
    val nodata = table.nodata
    val chunks = chunkFiles(table.manifest.files, maxChunks)
    val ctx = contextDigest(zones, table.manifest, collectValues)
    val computed = new java.util.concurrent.atomic.AtomicInteger(0)

    // Chunks are independent Spark jobs; submitting them from a
    // bounded pool keeps several in flight so per-job fixed costs
    // (scheduling, parquet commit) overlap with other chunks' compute
    // instead of serializing the cluster behind the driver loop.
    val concurrency = math.min(chunks.size, math.max(1,
      sys.env.getOrElse("GRAFT_CKPT_CONCURRENCY", "12").toInt))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)

    def runChunk(files: Seq[graft.sources.TileFileStat], i: Int): Unit = {
      val fp = fingerprint(ctx, files)
      if (!isChunkDone(ckptDir, i, fp)) {
        val t0 = System.nanoTime()
        val dir = chunkDir(ckptDir, i)
        val tiles = spark.read.parquet(
          files.map(f => s"${table.root}/${f.path}"): _*)
        val partials = ZonalStats.tilePartials(tiles, bc, grid, nodata,
          collectValues).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // one kernel pass fills the cache; metrics + write both
          // read the persisted partials
          val metrics = partials
            .groupBy(spark_partition_id().as("partition"))
            .agg(count(lit(1)).as("partial_rows"),
              sum("cnt").as("pixels"))
            .collect()
          partials.write.mode("overwrite").parquet(s"$dir/partials")
          writeLineage(dir, i, files, fp, runId,
            (System.nanoTime() - t0) / 1e6,
            metrics.map(r => (r.getInt(0), r.getLong(1),
              if (r.isNullAt(2)) 0L else r.getLong(2))))
        } finally partials.unpersist()
        computed.incrementAndGet()
      }
    }

    val progress = Progress.attach(spark, s"$ckptDir/progress.jsonl")
    try {
      val futures = chunks.zipWithIndex.map { case (files, i) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = runChunk(files, i)
        })
      }
      futures.foreach(_.get()) // propagate the first failure
    } finally {
      pool.shutdownNow()
      Progress.detach(spark, progress)
    }

    val all = spark.read.parquet(
      chunks.indices.map(i => s"${chunkDir(ckptDir, i)}/partials"): _*)
    (ZonalStats.fidStats(all.drop("vals")), computed.get())
  }

  /** Full resumable zonal run: chunked partials → merge → rollup via
    * the standard engine path (fallback pass + zero-fill included).
    *
    * @param keepCheckpoints false = the reference's
    *   `clean_working_dir=True` (`runner.py:921-923`): materialize the
    *   result, then delete the checkpoint dir.
    */
  def resumableGroupStats(spark: SparkSession, table: TileTable,
      zones: Seq[Zone], ckptDir: String, runId: String,
      maxChunks: Int = DefaultMaxChunks,
      keepCheckpoints: Boolean = true): DataFrame = {
    import spark.implicits._
    val zonesSimpl = zones.map(z =>
      z.copy(geom = Zone.simplifyHalfPixel(z.geom, table.grid.gt.px)))
    val (fidStats, _) = chunkedFidStats(spark, table, zonesSimpl, ckptDir,
      runId, maxChunks = maxChunks)
    val zonesDf = zonesSimpl.map(z => (z.fid, Option(z.group)))
      .toDF("fid", "group")
    // unset-FID fallback, pruned to the union of the unset zones'
    // envelopes (not a full table scan)
    val present = fidStats.select("fid").as[Long].collect().toSet
    val unset = zonesSimpl.filter(z => !present.contains(z.fid))
    val fidAll = ZonalEngine.mergeFallback(spark, fidStats, unset,
      table.grid, table.nodata, env => table.readPruned(spark, env))
    val res = ZonalStats.groupStats(fidAll, zonesDf, None)
    if (keepCheckpoints) res
    else {
      // result is dimension-sized: materialize, then GC the scratch
      val rows = res.collect().toSeq
      val out = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), res.schema)
      deleteRecursively(Paths.get(ckptDir))
      out
    }
  }

  private[graft] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  private def writeLineage(dir: String, chunk: Int,
      files: Seq[TileFileStat], fp: String, runId: String, wallMs: Double,
      partitions: Array[(Int, Long, Long)]): Unit = {
    val o = mapper.createObjectNode()
    o.put("chunk", chunk)
    val fa = o.putArray("files")
    files.foreach(f => fa.add(f.path))
    o.put("cellMin", files.map(_.cellMin).min)
    o.put("cellMax", files.map(_.cellMax).max)
    o.put("fingerprint", fp)
    o.put("runId", runId)
    o.put("wallMs", wallMs)
    val arr = o.putArray("partitions")
    partitions.sortBy(_._1).foreach { case (p, rows, px) =>
      val po = arr.addObject()
      po.put("partition", p); po.put("partialRows", rows)
      po.put("pixels", px)
    }
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, ".lineage.json.tmp")
    Files.writeString(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o))
    Files.move(tmp, Paths.get(dir, "lineage.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def lineageField(ckptDir: String, i: Int,
      field: String): Option[String] = {
    val p = Paths.get(chunkDir(ckptDir, i), "lineage.json")
    if (!Files.exists(p)) None
    else Option(mapper.readTree(Files.readString(p)).get(field))
      .map(_.asText())
  }

  def lineageRunId(ckptDir: String, i: Int): Option[String] =
    lineageField(ckptDir, i, "runId")
}
