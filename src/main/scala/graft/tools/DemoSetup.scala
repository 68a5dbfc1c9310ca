package graft.tools

import graft.engine.{Fixtures, ZoneStore}
import graft.sources.TileTable
import graft.synth.Synth
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Build a self-contained demo workspace for `graft.Main`: two tile
  * tables ("rasters"), a zones parquet ("aggregate vector") and a
  * ready-to-run INI job config. Usage:
  *
  *   spark-submit --class graft.tools.DemoSetup <jar> <dir>
  *   spark-submit --class graft.Main <jar> <dir>/demo.ini
  */
object DemoSetup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-demo")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val grid = Synth.testGrid
    Seq(0 -> "rasterA", 1 -> "rasterB").foreach { case (v, stem) =>
      val root = s"$dir/tables/$stem"
      // demo workspace: a re-run rebuilds from scratch (TileTable.write
      // refuses to overwrite a live table)
      if (TileTable.exists(root))
        graft.engine.Checkpoints.deleteRecursively(Paths.get(root))
      TileTable.write(spark, Synth.tiles(spark, grid, "raw", v), grid,
        Some(-9999.0), root, cellLevel = 8, numFiles = 2)
    }
    Files.createDirectories(Paths.get(s"$dir/vec"))
    ZoneStore.write(spark, Fixtures.zonesBasic(grid), "region_group",
      s"$dir/vec/zones.parquet")
    Files.writeString(Paths.get(s"$dir/demo.ini"),
      s"""[project]
         |name = demo
         |global_work_dir = $dir/workdir
         |global_output_dir = $dir/output
         |log_level = INFO
         |
         |[job:regions]
         |agg_vector = $dir/vec/zones.parquet
         |agg_field = region_group
         |operations = avg,stdev,valid_count,total_count,p5,p95
         |row_col_order=agg_field,base_raster
         |base_raster_pattern=$dir/tables/*
         |
         |[job:regions_wide]
         |agg_vector = $dir/vec/zones.parquet
         |agg_field = region_group
         |operations = avg,stdev,valid_count,total_count,p5,p95
         |row_col_order=base_raster,agg_field
         |base_raster_pattern=$dir/tables/*
         |""".stripMargin)
    // the reference names configs <name>.ini with name == stem
    Files.move(Paths.get(s"$dir/demo.ini"), Paths.get(s"$dir/demo.ini"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"[graft] demo workspace ready at $dir")
    spark.stop()
  }
}
