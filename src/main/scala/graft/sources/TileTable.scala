package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.functions.{functions => gf}
import graft.geom.{GeoTransform, Morton, RasterGrid}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.locationtech.jts.geom.Envelope

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style tile table: cell-sorted Parquet data files + a JSON
  * manifest carrying table metadata (grid geo-referencing, nodata,
  * cell level) and per-file cell-range statistics.
  *
  * This plays the role of the raster metadata scan + block layout of
  * the reference (`/root/reference/runner.py:295-305,542-545`) at
  * 10^12-image design scale:
  *   - file-level pruning: the manifest's [cellMin, cellMax] per file
  *     is intersected with the Morton cover of the query envelope, so
  *     a zonal job over a region touches only that region's files;
  *   - row-group pruning: rows are range-partitioned AND sorted by
  *     `cell`, so the pushed `cell BETWEEN` predicates prune Parquet
  *     row groups via min/max stats inside each touched file.
  *
  * Scale envelope of the single-JSON manifest: 10^12 tiles at ~10^6
  * rows/file is ~10^6 file entries ≈ 10^2 MB of manifest — loadable
  * on a driver and prunable in milliseconds (entries are cell-sorted;
  * the linear intersect could become a binary search). Beyond ~10^7
  * entries the next step is the Iceberg manifest-tree shape (manifest
  * lists pointing at range-partitioned manifest shards) behind the
  * same open/prune API; nothing downstream depends on the flat
  * layout.
  */
final case class TileFileStat(path: String, cellMin: Long, cellMax: Long,
    rows: Long)

/** Per-band metadata — the reference addresses rasters as
  * `(path, band)` with per-band nodata (`runner.py:264-265,295-296`). */
final case class BandInfo(band: Int, nodata: Option[Double])

final case class TileManifest(grid: RasterGrid, nodata: Option[Double],
    cellLevel: Int, files: Seq[TileFileStat],
    srs: Option[String] = None,
    bands: Seq[BandInfo] = Nil)

class TileTable(val root: String, val manifest: TileManifest) {

  /** Full scan (all data files). */
  def read(spark: SparkSession): DataFrame =
    spark.read.parquet(manifest.files.map(f => s"$root/${f.path}"): _*)

  /** Manifest-pruned scan: only files whose cell range intersects the
    * Morton cover of `env`, with the cell-range predicate pushed into
    * the Parquet scan for row-group pruning. Falls back to an empty
    * frame when nothing overlaps.
    *
    * A tile's `cell` encodes its CENTER, so the query envelope is
    * inflated by half a tile extent first — otherwise a tile that
    * overlaps the envelope edge-on (center outside) would be missed,
    * silently dropping pixels. */
  def readPruned(spark: SparkSession, env: Envelope): DataFrame = {
    val (files, ranges) = prunedFilesWithRanges(env)
    if (files.isEmpty) return read(spark).limit(0)
    val df = spark.read.parquet(files.map(f => s"$root/${f.path}"): _*)
    val pred = ranges.map { case (lo, hi) =>
      col("cell").between(lo, hi)
    }.reduce(_ || _)
    df.where(pred)
  }

  /** Manifest files whose cell range intersects the Morton cover of
    * `env` (the file-level half of [[readPruned]]) — lets callers that
    * manage their own scans (chunked/resumable execution) skip files a
    * zonal job can never touch. */
  def prunedFiles(env: Envelope): Seq[TileFileStat] =
    prunedFilesWithRanges(env)._1

  private def prunedFilesWithRanges(env: Envelope)
      : (Seq[TileFileStat], Seq[(Long, Long)]) = {
    val g = manifest.grid
    val inflated = new Envelope(env)
    inflated.expandBy(math.abs(g.gt.px) * g.tileW / 2.0,
      math.abs(g.gt.py) * g.tileH / 2.0)
    val ranges = Morton.coverRangesCapped(inflated.getMinX,
      inflated.getMaxX, inflated.getMinY, inflated.getMaxY,
      manifest.cellLevel)
    val files = manifest.files.filter(f =>
      ranges.exists { case (lo, hi) => f.cellMax >= lo && f.cellMin <= hi })
    (files, ranges)
  }

  def grid: RasterGrid = manifest.grid
  def nodata: Option[Double] = manifest.nodata

  /** Per-band nodata; falls back to the table-level value for
    * single-band tables (reference `raster_info["nodata"][band-1]`). */
  def nodataFor(band: Int): Option[Double] =
    manifest.bands.find(_.band == band).map(_.nodata)
      .getOrElse(manifest.nodata)

  /** Optional-band variants — the one place "scan this table,
    * optionally one band of it" is spelled out (job path, resumable
    * path and fallback scans all dispatch through these). */
  def nodataFor(band: Option[Int]): Option[Double] =
    band.map(nodataFor).getOrElse(nodata)

  def readPruned(spark: SparkSession, env: Envelope,
      band: Option[Int]): DataFrame = band match {
    case Some(b) => readPrunedBand(spark, env, b)
    case None => readPruned(spark, env)
  }

  /** Manifest-pruned scan of ONE band of a multi-band table. The
    * band-equality predicate lands in the parquet scan; rows are
    * sorted (band, cell) inside each file so both predicates prune
    * row groups via min/max stats. */
  def readPrunedBand(spark: SparkSession, env: Envelope,
      band: Int): DataFrame = {
    require(manifest.bands.nonEmpty, s"$root is not multi-band")
    readPruned(spark, env).where(col("band") === band)
  }
}

object TileTable {
  val FormatName = "graft-tile-v1"
  val DefaultCellLevel = 12

  private val mapper = new ObjectMapper()

  /** Write a tile table: adds the Morton `cell` column (tile-center
    * cell at `cellLevel`), range-partitions + sorts by it, writes
    * Parquet, then collects per-file cell stats into the manifest.
    * `tiles` must carry the input_hint schema (image_id, bytes, w, h,
    * fmt, caption, phash). */
  def write(spark: SparkSession, tiles: DataFrame, grid: RasterGrid,
      nodata: Option[Double], root: String,
      cellLevel: Int = DefaultCellLevel,
      numFiles: Int = 0,
      srs: Option[String] = None,
      bands: Seq[BandInfo] = Nil): TileTable = {
    val n = if (numFiles > 0) numFiles
      else math.max(1, math.min(64, (grid.numTiles / 256).toInt))
    val stats = writeDataFiles(spark,
      withCellColumn(tiles, grid, cellLevel), root, "data", n, bands)
    val man = TileManifest(grid, nodata, cellLevel, stats, srs, bands)
    writeManifest(root, man)
    new TileTable(root, man)
  }

  /** Tile-center Morton cell from image_id — the ONE definition of
    * the table's cell derivation (initial write and streaming appends
    * must agree or pruning silently breaks). Exact arithmetic. */
  private def withCellColumn(tiles: DataFrame, grid: RasterGrid,
      cellLevel: Int): DataFrame = {
    val tr = regexp_extract(col("image_id"), "tile_(\\d+)_(\\d+)", 1)
      .cast("int")
    val tc = regexp_extract(col("image_id"), "tile_(\\d+)_(\\d+)", 2)
      .cast("int")
    val cx = lit(grid.gt.x0) + (tc.cast("double") + 0.5) *
      (grid.gt.px * grid.tileW)
    val cy = lit(grid.gt.y0) + (tr.cast("double") + 0.5) *
      (grid.gt.py * grid.tileH)
    tiles.withColumn("cell", gf.cell_id(cx, cy, lit(cellLevel)))
  }

  /** Write cell-sorted data files under `root/<dirName>` and return
    * their per-file cell stats (paths relative to root). Multi-band:
    * range-partition by cell (file pruning stays band-agnostic), sort
    * (band, cell) inside files so a band-equality predicate prunes
    * row groups before the cell range does. */
  private def writeDataFiles(spark: SparkSession, withCell: DataFrame,
      root: String, dirName: String, n: Int,
      bands: Seq[BandInfo]): Seq[TileFileStat] = {
    val dataDir = s"$root/$dirName"
    val sorted =
      if (bands.nonEmpty)
        withCell.repartitionByRange(n, col("cell"))
          .sortWithinPartitions("band", "cell")
      else
        withCell.repartitionByRange(n, col("cell"))
          .sortWithinPartitions("cell")
    sorted.write.mode("overwrite").parquet(dataDir)

    // per-file stats from the written files themselves
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(min("cell").as("cmin"), max("cell").as("cmax"),
        count(lit(1)).as("rows"))
      .collect()
      .map { r =>
        val full = r.getString(0)
        val rel = s"$dirName/" + full.substring(full.lastIndexOf('/') + 1)
        TileFileStat(rel, r.getLong(1), r.getLong(2), r.getLong(3))
      }.sortBy(_.cellMin).toSeq
  }

  /** Coarse per-table mutation lock (atomic O_EXCL file create, stale
    * locks stolen after `staleMs`): [[appendBatch]] and [[compact]]
    * both mutate the manifest read-modify-write style, so without
    * mutual exclusion a concurrent pair could lose an update or leave
    * the manifest referencing deleted files. Works on POSIX/HDFS
    * semantics; object stores without atomic create need an external
    * coordinator (the same caveat as any file-based table format
    * without a catalog). */
  private def withTableLock[A](root: String,
      staleMs: Long = 10 * 60 * 1000L)(body: => A): A = {
    val lock = Paths.get(root, "_lock")
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var held = false
    while (!held) {
      try { Files.createFile(lock); held = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age = try System.currentTimeMillis() -
            Files.getLastModifiedTime(lock).toMillis
          catch { case _: Exception => 0L }
          if (age > staleMs) Files.deleteIfExists(lock) // crashed holder
          else if (System.nanoTime() > deadline)
            throw new IllegalStateException(s"timed out on $lock")
          else Thread.sleep(50)
      }
    }
    try body finally Files.deleteIfExists(lock)
  }

  /** Append a micro-batch of tiles to an existing table — the
    * `foreachBatch` sink for streaming ingest. The batch lands as a
    * file set under `append-<batchId>` and its stats APPEND to the
    * manifest atomically under the table lock, so concurrent readers
    * always see a complete table and a crash between the data write
    * and the manifest swap leaves only unreferenced files.
    * IDEMPOTENT in `batchId`: foreachBatch redelivers a batch after a
    * crash (at-least-once), and a replayed id whose files are already
    * referenced is a no-op — exactly-once table contents. Streaming
    * ingest fragments the layout by design — run [[compact]]
    * periodically to restore it. */
  def appendBatch(spark: SparkSession, root: String, tiles: DataFrame,
      batchId: Long): TileTable = withTableLock(root) {
    val t = open(root)
    val dir = s"append-$batchId"
    if (t.manifest.files.exists(_.path.startsWith(s"$dir/"))) t // replay
    else {
      val withCell = withCellColumn(tiles, t.grid, t.manifest.cellLevel)
      val stats = writeDataFiles(spark, withCell, root, dir, 1,
        t.manifest.bands)
      writeManifest(root, t.manifest.copy(
        files = (t.manifest.files ++ stats).sortBy(_.cellMin)))
      open(root)
    }
  }

  /** Compact a table's data layout into `numFiles` cell-sorted files —
    * the Iceberg-style maintenance pass for the small-files problem
    * (incremental/streaming ingest fragments the layout; compaction
    * restores the manifest's pruning ratio and per-task scan size).
    * The rewrite lands in a NEW generation directory and the manifest
    * swap is atomic under the table lock (mutually exclusive with
    * [[appendBatch]], so no append is ever lost). Row content is
    * preserved exactly (same rows, new physical order/grouping).
    *
    * @param keepOld true leaves the previous generation's files on
    *   disk — use it (plus a later cleanup) when long-running readers
    *   may still hold file paths resolved from the pre-compact
    *   manifest; the default deletes them immediately. */
  def compact(spark: SparkSession, root: String, numFiles: Int,
      keepOld: Boolean = false): TileTable = withTableLock(root) {
    require(numFiles > 0, "numFiles must be positive")
    val t = open(root)
    if (t.manifest.files.isEmpty) t // nothing to compact
    else {
      val oldDirs = t.manifest.files.map(f => parentDir(f.path)).distinct
      // next generation dir: data -> data-1 -> data-2 ...
      val genNums = oldDirs.map {
        case "data" => 0
        case d => d.stripPrefix("data-").toIntOption.getOrElse(0)
      }
      val newDir = s"data-${(0 +: genNums).max + 1}"
      val stats = writeDataFiles(spark, t.read(spark), root, newDir,
        numFiles, t.manifest.bands)
      writeManifest(root, t.manifest.copy(files = stats))
      if (!keepOld) oldDirs.foreach(d =>
        graft.engine.Checkpoints.deleteRecursively(Paths.get(root, d)))
      open(root)
    }
  }

  def writeManifest(root: String, m: TileManifest): Unit = {
    val o = mapper.createObjectNode()
    o.put("format", FormatName)
    val g = o.putObject("grid")
    g.put("x0", m.grid.gt.x0); g.put("px", m.grid.gt.px)
    g.put("y0", m.grid.gt.y0); g.put("py", m.grid.gt.py)
    g.put("widthPx", m.grid.widthPx); g.put("heightPx", m.grid.heightPx)
    g.put("tileW", m.grid.tileW); g.put("tileH", m.grid.tileH)
    m.nodata.foreach(nd => o.put("nodata", nd))
    m.srs.foreach(s => o.put("srs", s))
    if (m.bands.nonEmpty) {
      val ba = o.putArray("bands")
      m.bands.foreach { b =>
        val bo = ba.addObject()
        bo.put("band", b.band)
        b.nodata.foreach(nd => bo.put("nodata", nd))
      }
    }
    o.put("cellLevel", m.cellLevel)
    val arr = o.putArray("files")
    m.files.foreach { f =>
      val fo = arr.addObject()
      fo.put("path", f.path); fo.put("cellMin", f.cellMin)
      fo.put("cellMax", f.cellMax); fo.put("rows", f.rows)
    }
    val tmp = Paths.get(root, ".manifest.json.tmp")
    Files.createDirectories(Paths.get(root))
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(o))
    Files.move(tmp, Paths.get(root, "manifest.json"),
      StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def open(root: String): TileTable = {
    val j = mapper.readTree(Files.readString(Paths.get(root, "manifest.json")))
    require(j.get("format").asText() == FormatName,
      s"not a $FormatName table: $root")
    val g = j.get("grid")
    val grid = RasterGrid(
      GeoTransform(g.get("x0").asDouble(), g.get("px").asDouble(), 0.0,
        g.get("y0").asDouble(), 0.0, g.get("py").asDouble()),
      g.get("widthPx").asInt(), g.get("heightPx").asInt(),
      g.get("tileW").asInt(), g.get("tileH").asInt())
    val nodata = Option(j.get("nodata")).map(_.asDouble())
    val files = j.get("files").elements().asScala.map { f =>
      TileFileStat(f.get("path").asText(), f.get("cellMin").asLong(),
        f.get("cellMax").asLong(), f.get("rows").asLong())
    }.toSeq
    val bands = Option(j.get("bands")).map(_.elements().asScala.map { b =>
      BandInfo(b.get("band").asInt(),
        Option(b.get("nodata")).map(_.asDouble()))
    }.toSeq).getOrElse(Nil)
    new TileTable(root, TileManifest(grid, nodata,
      j.get("cellLevel").asInt(), files,
      Option(j.get("srs")).map(_.asText()), bands))
  }

  def exists(root: String): Boolean =
    Files.exists(Paths.get(root, "manifest.json"))

  /** Parent directory name of a manifest file path (the generation
    * dir) — the one definition shared by compact and vacuum. */
  private def parentDir(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) "" else path.substring(0, i)
  }

  /** Delete every data directory the current manifest does NOT
    * reference — pre-compaction generations kept with
    * `compact(keepOld = true)` and orphaned `append-*` dirs from
    * crashes between a batch's data write and its manifest swap.
    * Returns the deleted directory names. Runs under the table lock,
    * and additionally SKIPS directories modified within `graceMs`
    * (default = the lock's staleness window): if a wedged
    * append/compact ever overruns the lock's stale-steal threshold,
    * its actively-written directory still looks fresh and survives —
    * a lost-lock race can cost a manifest update, never data. */
  def vacuum(root: String,
      graceMs: Long = 10 * 60 * 1000L): Seq[String] = withTableLock(root) {
    val t = open(root)
    val referenced = t.manifest.files.map(f => parentDir(f.path)).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val dirs = Files.list(Paths.get(root))
    val removable =
      try {
        dirs.iterator().asScala
          .filter(Files.isDirectory(_))
          .filter(p =>
            try Files.getLastModifiedTime(p).toMillis < cutoff
            catch { case _: Exception => false })
          .map(_.getFileName.toString)
          .filter(d => (d == "data" || d.startsWith("data-") ||
            d.startsWith("append-")) && !referenced.contains(d))
          .toSeq
      } finally dirs.close()
    removable.foreach(d =>
      graft.engine.Checkpoints.deleteRecursively(Paths.get(root, d)))
    removable.sorted
  }
}
