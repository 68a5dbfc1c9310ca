package graft.tools
import org.apache.spark.sql.SparkSession
/** Drives the user-facing extension path: load GraftExtensions via the
  * spark.sql.extensions CONFIG (as a spark-submit user would) and run
  * SQL using the engine's functions. */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("""
      SELECT is_close(0.0500001, 0.05) AS close_true,
             is_close(0.06, 0.05) AS close_false,
             cell_id(10.0, 20.0, 8) AS cell,
             xxh64(CAST('abc' AS BINARY)) AS h""").show(false)
    // probe: wrong arity
    try spark.sql("SELECT is_close(1.0)").collect()
    catch { case e: Exception =>
      println("[sqldemo] arity error: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
