package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Session extension registering the engine's Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT is_close(a, b) ...")` works:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  */
object GraftExtensions {
  /** Register the same functions on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.GraftColumnBridge.registerTempFunction
    new GraftExtensions().builders.foreach { case (name, b) =>
      registerTempFunction(spark, name, b)
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** (name, expression builder) for every engine SQL function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def d(e: Expression) = Cast(e, DoubleType)
    Seq(
      // SQL numeric literals may arrive as DECIMAL - coerce here
      // (the expressions have no ExpectsInputTypes; see expressions.scala)
      "is_close" -> { (args: Seq[Expression]) => args match {
        case Seq(a, b) => IsCloseTo(d(a), d(b))
        case Seq(a, b, Literal(rtol: Double, _), Literal(atol: Double, _)) =>
          IsCloseTo(d(a), d(b), rtol, atol)
        case _ => throw new IllegalArgumentException(
          "is_close(a, b[, rtol, atol])")
      }},
      "image_decode" -> { (args: Seq[Expression]) =>
        ImageDecode(args(0), args(1)) },
      "cell_id" -> { (args: Seq[Expression]) =>
        MortonCellId(d(args(0)), d(args(1)), Cast(args(2), IntegerType)) },
      "xxh64" -> { (args: Seq[Expression]) => args match {
        case Seq(b) => XxHash64Bytes(b, 0L)
        case Seq(b, Literal(seed: Long, _)) => XxHash64Bytes(b, seed)
        case _ => throw new IllegalArgumentException("xxh64(bytes[, seed])")
      }})
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      val info = new ExpressionInfo(classOf[GraftExtensions].getName,
        null, name, null, "", "", "", "", "", "", "scala_udf")
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}
