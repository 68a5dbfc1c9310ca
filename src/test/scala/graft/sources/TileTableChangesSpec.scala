package graft.sources

import graft.SparkSpec
import graft.engine.Fixtures
import graft.operators.{ZonalEngine, ZonalStats}
import graft.synth.Synth
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental (CDC) reads over the versioned tile table:
  * [[TileTable.changedFiles]]/[[TileTable.readChanges]] must yield
  * exactly the rows appended between two manifest versions — appends
  * accumulate, compaction rewrites contribute nothing, untagged
  * removals and vacuumed windows fail loudly — and the zonal
  * incremental-merge path ([[ZonalStats.mergeFidStats]],
  * [[ZonalEngine.runIncremental]]) must equal a full recompute. */
class TileTableChangesSpec extends SparkSpec {
  private val grid = Synth.testGrid

  /** North-half create (v1) + south-half append batch 0 (v2). */
  private def splitTable(): (String, Long, Long) = {
    val dir = Files.createTempDirectory("graft-cdc").toString + "/t"
    val all = Synth.tiles(spark, grid)
    val tr = regexp_extract(col("image_id"), "tile_(\\d+)_(\\d+)", 1)
      .cast("int")
    val north = all.where(tr < lit(grid.tilesY / 2))
    val south = all.where(tr >= lit(grid.tilesY / 2))
    val nNorth = north.count()
    val nSouth = south.count()
    TileTable.write(spark, north, grid, Some(-9999.0), dir,
      cellLevel = 8, numFiles = 2)
    TileTable.appendBatch(spark, dir, south, batchId = 0L)
    (dir, nNorth, nSouth)
  }

  test("changedFiles between create and append is exactly the " +
      "appended batch; from 0 it is the whole table") {
    val (dir, nNorth, nSouth) = splitTable()
    assert(TileTable.currentVersion(dir) == 2)
    val delta = TileTable.changedFiles(dir, 1, 2)
    assert(delta.nonEmpty && delta.forall(_.path.startsWith("append-0-")),
      s"delta leaked beyond the appended batch: ${delta.map(_.path)}")
    assert(TileTable.readChanges(spark, dir, 1, 2).count() == nSouth)
    // since-the-empty-table: the create's own files count as appended
    assert(TileTable.readChanges(spark, dir, 0, 2).count() ==
      nNorth + nSouth)
    // empty window
    assert(TileTable.changedFiles(dir, 2, 2).isEmpty)
    assert(TileTable.readChanges(spark, dir, 2, 2).count() == 0)
  }

  test("a compaction step contributes no rows; appends before and " +
      "after it still surface") {
    val (dir, _, nSouth) = splitTable()
    TileTable.compact(spark, dir, numFiles = 1, keepOld = true)
    assert(TileTable.currentVersion(dir) == 3)
    assert(TileTable.commitOp(dir, 3).contains(TileTable.OpReplace))
    assert(TileTable.changedFiles(dir, 2, 3).isEmpty,
      "compaction rewrote rows but appended none")
    // window crossing the compact: still just batch 0
    assert(TileTable.readChanges(spark, dir, 1, 3).count() == nSouth)
    // an append AFTER the compact surfaces alone in its step
    val extra = Synth.tiles(spark, grid).limit(3)
    TileTable.appendBatch(spark, dir, extra, batchId = 1L)
    assert(TileTable.readChanges(spark, dir, 3, 4).count() == 3)
    assert(TileTable.readChanges(spark, dir, 1, 4).count() == nSouth + 3)
  }

  test("an untagged commit that removed files fails the incremental " +
      "read loudly instead of guessing") {
    val (dir, _, _) = splitTable()
    // simulate a rogue rewrite: drop one file under the APPEND tag
    TileTable.mutateManifest(dir)(m =>
      Some(m.copy(files = m.files.drop(1))))
    val e = intercept[IllegalStateException](
      TileTable.changedFiles(dir, 1, TileTable.currentVersion(dir)))
    assert(e.getMessage.contains("removed"), e.getMessage)
  }

  test("a vacuumed fromVersion refuses with the retainVersions hint") {
    val (dir, _, _) = splitTable()
    TileTable.compact(spark, dir, numFiles = 1) // v3
    TileTable.vacuum(dir, graceMs = 0L, retainVersions = 1)
    val e = intercept[IllegalArgumentException](
      TileTable.changedFiles(dir, 1, 3))
    assert(e.getMessage.contains("retainVersions"), e.getMessage)
  }

  test("mergeFidStats over the two halves equals fidStats over the " +
      "whole table (monoid parity, nodata sentinels included)") {
    val (dir, _, _) = splitTable()
    val zones = Fixtures.zonesBasic(grid)
    val full = ZonalEngine.fidStatsFor(spark,
      TileTable.open(dir).read(spark), zones, grid, Some(-9999.0))
    val north = ZonalEngine.fidStatsFor(spark,
      TileTable.openAt(dir, 1).read(spark), zones, grid, Some(-9999.0))
    val south = ZonalEngine.fidStatsFor(spark,
      TileTable.readChanges(spark, dir, 1, 2), zones, grid,
      Some(-9999.0))
    val merged = ZonalStats.mergeFidStats(north, south)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val (f, m) = (key(full), key(merged))
    assert(f.keySet == m.keySet)
    for (fid <- f.keySet)
      assert(f(fid) == m(fid), s"fid $fid: full=${f(fid)} merged=${m(fid)}")

    // the DRIVER-SIDE fold (what runIncremental actually executes)
    // is bit-identical to the Spark agg
    val local = ZonalStats.fidStatsFrame(spark,
      ZonalStats.mergeFidStatsLocal(
        ZonalStats.collectFidStats(north),
        ZonalStats.collectFidStats(south)))
    val l = key(local)
    assert(l.keySet == f.keySet)
    for (fid <- f.keySet)
      assert(l(fid) == f(fid), s"fid $fid: full=${f(fid)} local=${l(fid)}")
    graft.engine.Caches.drain(spark)
  }

  test("retractFidStatsLocal matches the Spark retractFidStats row " +
      "for row, including the min/max recompute flag and zero-drop") {
    import spark.implicits._
    // hand-built stats exercising every branch: plain subtract,
    // extreme-witness retraction (flag), full retraction (drop),
    // all-nodata remainder (sentinel reset), untouched fid
    val cur = Seq(
      (1L, 10L, 2L, 1.0, 9.0, 40.0, 250.0),   // plain subtract
      (2L, 5L, 0L, 2.0, 8.0, 25.0, 145.0),    // retract touches max
      (3L, 4L, 1L, 3.0, 3.0, 9.0, 27.0),      // fully removed
      (4L, 6L, 3L, 5.0, 7.0, 18.0, 110.0),    // remainder all-nodata
      (5L, 2L, 0L, 1.5, 2.5, 4.0, 8.5))       // untouched
      .toDF("fid", "cnt", "nodata", "mn", "mx", "sum", "sumsq")
    val removed = Seq(
      (1L, 3L, 1L, 2.0, 8.0, 10.0, 68.0),
      (2L, 2L, 0L, 4.0, 8.0, 12.0, 80.0),     // r_mx >= mx → flag
      (3L, 4L, 1L, 3.0, 3.0, 9.0, 27.0),
      (4L, 3L, 0L, 5.0, 7.0, 18.0, 110.0))    // leaves 3 nodata-only
      .toDF("fid", "cnt", "nodata", "mn", "mx", "sum", "sumsq")
    val sparkSide = ZonalStats.retractFidStats(cur, removed)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))).toMap
    val (safe, unsafe) = ZonalStats.retractFidStatsLocal(
      ZonalStats.collectFidStats(cur),
      ZonalStats.collectFidStats(removed))
    // same survivors: spark keeps flagged rows inline, local splits
    // them out — together they must agree exactly
    assert(unsafe == sparkSide.filter(_._2._7).keySet)
    val safeMap = safe.map(r => r.fid ->
      (r.cnt, r.nodata, r.mn, r.mx, r.sum, r.sumsq)).toMap
    val sparkSafe = sparkSide.filterNot(_._2._7).map { case (f, t) =>
      f -> (t._1, t._2, t._3, t._4, t._5, t._6) }
    assert(safeMap == sparkSafe,
      s"local=$safeMap\nspark=$sparkSafe")
    assert(!safeMap.contains(3L), "fully-removed fid must drop")
    assert(safeMap(4L)._3.isPosInfinity && safeMap(4L)._4.isNegInfinity,
      "all-nodata remainder must reset extremes to sentinels")
    assert(unsafe == Set(2L))
    graft.engine.Caches.drain(spark)
  }

  test("CDC reads run unchanged against the CAS (object-store) " +
      "manifest double, including across a compaction") {
    val dir = Files.createTempDirectory("graft-cdc-cas").toString + "/t"
    val store = new InMemoryCasStore
    ManifestStore.register(dir, store)
    try {
      val all = Synth.tiles(spark, grid)
      val tr = regexp_extract(col("image_id"), "tile_(\\d+)_(\\d+)", 1)
        .cast("int")
      val south = all.where(tr >= lit(grid.tilesY / 2))
      TileTable.write(spark, all.where(tr < lit(grid.tilesY / 2)), grid,
        Some(-9999.0), dir, cellLevel = 8, numFiles = 2)
      TileTable.appendBatch(spark, dir, south, batchId = 0L)
      TileTable.compact(spark, dir, numFiles = 1, keepOld = true)
      TileTable.appendBatch(spark, dir, all.limit(2), batchId = 1L)
      assert(store.keys.exists(_.startsWith("manifest-v4")),
        "metadata plane not in the double")
      val nSouth = south.count()
      assert(TileTable.readChanges(spark, dir, 1, 4).count() ==
        nSouth + 2)
      assert(TileTable.changedFiles(dir, 2, 3).isEmpty)
    } finally ManifestStore.unregister(dir)
  }

  test("runIncremental across a compaction step folds only the " +
      "true appends and still equals a full recompute") {
    val (dir, _, _) = splitTable()
    TileTable.compact(spark, dir, numFiles = 1, keepOld = true) // v3
    val extra = Synth.tiles(spark, grid).limit(3)
    TileTable.appendBatch(spark, dir, extra, batchId = 1L) // v4
    val zones = Fixtures.zonesBasic(grid)
    val table = TileTable.open(dir)
    assert(table.version == 4)
    val prev = ZonalEngine.fidStatsFor(spark,
      TileTable.openAt(dir, 1).read(spark), zones, grid, Some(-9999.0))
    val inc = ZonalEngine.runIncremental(spark, table, zones, prev,
      fromVersion = 1)
    val fullRun = ZonalEngine.run(spark, table.read(spark), zones, grid,
      Some(-9999.0))
    val cols = fullRun.columns.sorted.map(col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.toIndexedSeq: _*).collect()
        .map(_.toSeq).sortBy(_.toString)
    assert(rows(inc).toSeq == rows(fullRun).toSeq)
    graft.engine.Caches.drain(spark)
  }

  // ---- row-level deletes ------------------------------------------

  private def trCol = regexp_extract(col("image_id"),
    "tile_(\\d+)_(\\d+)", 1).cast("int")

  test("deleteWhere: partial files get tombstones, fully-matching " +
      "files drop whole; every read path excludes the rows; " +
      "re-appended ids are NOT suppressed (file-scoped tombstones)") {
    val (dir, nNorth, nSouth) = splitTable()
    val total = nNorth + nSouth
    // the appended batch (south half) lives in its own file(s): delete
    // ALL of it (file drop) plus one north stripe (tombstones)
    val t2 = TileTable.deleteWhere(spark, dir,
      trCol >= lit(grid.tilesY / 2) || trCol === lit(1))
    assert(t2.manifest.deletes.nonEmpty, "expected tombstones")
    assert(TileTable.commitOp(dir, t2.version)
      .contains(TileTable.OpDelete))
    val stripe = grid.tilesX // one tile row
    assert(t2.read(spark).count() == total - nSouth - stripe)
    // dropped whole: the append files are out of the manifest
    assert(!t2.manifest.files.exists(_.path.startsWith("append-0-")),
      "fully-dead append files should drop from the manifest")
    // pruned reads apply tombstones too
    assert(t2.readPruned(spark, grid.rasterEnvelope).count() ==
      total - nSouth - stripe)
    // a no-match delete is a no-op commit
    val t3 = TileTable.deleteWhere(spark, dir, trCol === lit(9999))
    assert(t3.version == t2.version, "no-match delete must not commit")
    // re-append one previously-deleted tile: tombstones bind to the
    // OLD file, so the new row must survive
    val one = Synth.tiles(spark, grid).where(trCol === lit(1)).limit(1)
    val t4 = TileTable.appendBatch(spark, dir, one, batchId = 7L)
    assert(t4.read(spark).count() == total - nSouth - stripe + 1)
  }

  test("changedSets across a delete: removal step carries dropped " +
      "files + new tombstones; changedFiles refuses the window; " +
      "readChangesWithRemovals reconstructs exactly the removed rows") {
    val (dir, _, nSouth) = splitTable()
    val before = TileTable.open(dir)
    val deleted = before.read(spark)
      .where(trCol >= lit(grid.tilesY / 2) || trCol === lit(1))
    val delIds = deleted.select("image_id").collect()
      .map(_.getString(0)).toSet
    TileTable.deleteWhere(spark, dir,
      trCol >= lit(grid.tilesY / 2) || trCol === lit(1)) // v3
    val cs = TileTable.changedSets(dir, 2, 3)
    assert(cs.added.isEmpty)
    assert(cs.removals.size == 1)
    assert(cs.removals.head.droppedFiles.nonEmpty)
    assert(cs.removals.head.newTombstones.nonEmpty)
    intercept[IllegalStateException](TileTable.changedFiles(dir, 2, 3))
    val (added, removedOpt) =
      TileTable.readChangesWithRemovals(spark, dir, 2, 3)
    assert(added.count() == 0)
    val removed = removedOpt.get
    assert(removed.count() == delIds.size)
    assert(removed.select("image_id").collect().map(_.getString(0))
      .toSet == delIds)
    // window spanning append + delete: south rows appear on BOTH sides
    val (a2, r2) = TileTable.readChangesWithRemovals(spark, dir, 1, 3)
    assert(a2.count() == nSouth)
    assert(r2.get.count() == delIds.size)
  }

  test("a second delete does not re-remove rows already tombstoned " +
      "(prior deletes subtract from dropped-file retraction)") {
    val (dir, _, _) = splitTable()
    // tombstone one stripe...
    TileTable.deleteWhere(spark, dir, trCol === lit(1)) // v3
    // ...then drop files that CONTAIN that stripe's file(s) whole
    TileTable.deleteWhere(spark, dir,
      trCol < lit(grid.tilesY / 2)) // v4: rest of the north half
    val r34 = TileTable.readChangesWithRemovals(spark, dir, 3, 4)
      ._2.get
    assert(r34.where(trCol === lit(1)).count() == 0,
      "v4's retraction must not re-remove rows v3 already deleted")
    // fold check over the full window: adds minus removes = live rows
    val (aAll, rAll) = TileTable.readChangesWithRemovals(spark, dir, 0, 4)
    val live = TileTable.open(dir).read(spark).count()
    assert(aAll.count() - rAll.get.count() == live)
  }

  test("runIncremental across a delete equals a full recompute — " +
      "including retracted extremes (min/max recompute path)") {
    val (dir, _, _) = splitTable()
    val extra = Synth.tiles(spark, grid).limit(3)
    // re-appends tiles 0..2 as duplicate-cell rows: both paths must
    // count them twice (per-tile processing), staying value-identical
    TileTable.appendBatch(spark, dir, extra, batchId = 1L) // v3
    val zones = Fixtures.zonesBasic(grid)
    val prev = ZonalEngine.fidStatsFor(spark,
      TileTable.openAt(dir, 1).read(spark), zones, grid, Some(-9999.0))
    // delete a stripe that certainly holds some zone's max pixel
    TileTable.deleteWhere(spark, dir, trCol === lit(2)) // v4
    val table = TileTable.open(dir)
    val inc = ZonalEngine.runIncremental(spark, table, zones, prev,
      fromVersion = 1)
    val fullRun = ZonalEngine.run(spark, table.read(spark), zones, grid,
      Some(-9999.0))
    val cols = fullRun.columns.sorted.map(col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.toIndexedSeq: _*).collect()
        .map(_.toSeq).sortBy(_.toString)
    assert(rows(inc).toSeq == rows(fullRun).toSeq)
    graft.engine.Caches.drain(spark)
  }

  test("compact folds tombstones into the rewrite and clears the " +
      "delete list; CDC windows crossing delete+compact still work; " +
      "vacuum retires unreferenced tombstone files") {
    val (dir, _, _) = splitTable()
    TileTable.deleteWhere(spark, dir, trCol === lit(1)) // v3
    val liveBefore = TileTable.open(dir).read(spark).count()
    val t4 = TileTable.compact(spark, dir, numFiles = 1,
      keepOld = true) // v4
    assert(t4.manifest.deletes.isEmpty, "compact must clear tombstones")
    assert(t4.read(spark).count() == liveBefore)
    // the delete step's retraction is still readable across the
    // compact: exactly the one deleted tile-row (tilesX tiles)
    val (_, rOpt) = TileTable.readChangesWithRemovals(spark, dir, 2, 4)
    assert(rOpt.get.count() == grid.tilesX)
    // vacuum with retention 1: old versions (and with them the last
    // tombstone reference) age out; the del/ dir empties
    TileTable.vacuum(dir, graceMs = 0L, retainVersions = 1)
    val delDir = java.nio.file.Paths.get(dir, "del")
    val left =
      if (!java.nio.file.Files.isDirectory(delDir)) 0
      else {
        val s = java.nio.file.Files.list(delDir)
        try s.count() finally s.close()
      }
    assert(left == 0, s"expected tombstone GC, $left entries left")
    graft.engine.Caches.drain(spark)
  }

  test("runIncremental under lastWins (overlapping zones) equals a " +
      "lastWins full recompute — burn order is per-pixel, so appends " +
      "never change already-folded assignments") {
    val (dir, _, _) = splitTable()
    val zones = Fixtures.zonesBasic(grid) // overlapping by design
    val table = TileTable.open(dir)
    val prev = ZonalEngine.fidStatsFor(spark,
      TileTable.openAt(dir, 1).read(spark), zones, grid, Some(-9999.0),
      lastWins = true)
    val inc = ZonalEngine.runIncremental(spark, table, zones, prev,
      fromVersion = 1, lastWins = true)
    val fullRun = ZonalEngine.run(spark, table.read(spark), zones, grid,
      Some(-9999.0), lastWins = true)
    val cols = fullRun.columns.sorted.map(col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.toIndexedSeq: _*).collect()
        .map(_.toSeq).sortBy(_.toString)
    assert(rows(inc).toSeq == rows(fullRun).toSeq)
    graft.engine.Caches.drain(spark)
  }

  test("runIncremental equals a full recompute at the head") {
    val (dir, _, _) = splitTable()
    val zones = Fixtures.zonesBasic(grid)
    val table = TileTable.open(dir)
    val prev = ZonalEngine.fidStatsFor(spark,
      TileTable.openAt(dir, 1).read(spark), zones, grid, Some(-9999.0))
    val inc = ZonalEngine.runIncremental(spark, table, zones, prev,
      fromVersion = 1)
    val fullRun = ZonalEngine.run(spark, table.read(spark), zones, grid,
      Some(-9999.0))
    val cols = fullRun.columns.sorted.map(col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.toIndexedSeq: _*).collect()
        .map(_.toSeq).sortBy(_.toString)
    assert(rows(inc).toSeq == rows(fullRun).toSeq)
    graft.engine.Caches.drain(spark)
  }
}
