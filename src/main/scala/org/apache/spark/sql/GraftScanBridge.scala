package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Parquet scan over a KNOWN file list — the manifest-table read path.
  *
  * `spark.read.parquet(paths: _*)` builds an `InMemoryFileIndex`,
  * which LISTS every path: above
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` (32) the
  * listing runs as a one-task-per-path Spark JOB, and the per-query
  * `FileStatusCache` namespace means every fresh query pays it again
  * — measured 0.85 s wall / 27 CPU-s per zonal bench run on the
  * 512-file tile table, before the first data byte. A manifest table
  * already knows its exact file membership (the Iceberg/Delta
  * argument — see the optimization guide §6 "table formats with
  * manifest metadata avoid directory listing altogether"), so this
  * bridge hands Spark the `FileStatus` list directly: zero listing
  * jobs, and the caller controls how statuses are obtained (one
  * driver-side `listStatus` per parent directory, cacheable across
  * snapshots because committed data files are immutable).
  *
  * Lives in `org.apache.spark.sql` for the `private[sql]` access the
  * relation constructor needs (the [[GraftColumnBridge]] pattern).
  * Everything referenced is Spark's own v1 datasource machinery, so
  * filter pushdown, column pruning, `_metadata`, and vectorized
  * parquet reads behave exactly as with `spark.read.parquet`.
  */
object GraftScanBridge {

  /** DataFrame reading exactly `files` as parquet with `schema`.
    * Equivalent to `spark.read.schema(schema).parquet(paths: _*)`
    * minus the file listing (statuses are taken as given). */
  def parquetFrame(spark: SparkSession, schema: StructType,
      files: Seq[FileStatus]): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val rel = HadoopFsRelation(new GraftKnownFilesIndex(files),
      new StructType(), schema, None, new ParquetFileFormat(),
      Map.empty[String, String])(cs)
    cs.baseRelationToDataFrame(rel)
  }
}

/** [[FileIndex]] over an immutable, pre-resolved file list: no
  * listing, no partition discovery, no cache churn. File-level
  * pruning is the MANIFEST's job (cell-range index) — callers pass
  * the already-pruned list, so `listFiles` ignores the filters the
  * way a single-directory `InMemoryFileIndex` does for data filters.
  */
final class GraftKnownFilesIndex(files: Seq[FileStatus])
    extends FileIndex {
  private val dirs: Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))
  override def rootPaths: Seq[Path] = files.map(_.getPath)
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = dirs
  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override val sizeInBytes: Long = files.map(_.getLen).sum
  override def partitionSchema: StructType = new StructType()
}
