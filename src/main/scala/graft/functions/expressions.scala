package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `np.isclose(a, b)` as a codegen'd Catalyst expression — the
  * reference's nodata predicate (`/root/reference/runner.py:644-647`)
  * is a TOLERANCE compare, not equality:
  * `abs(a - b) <= atol + rtol * abs(b)` with numpy defaults
  * rtol=1e-5, atol=1e-8. NaNs are never close (numpy default).
  */
case class IsCloseTo(left: Expression, right: Expression,
    rtol: Double = 1e-5, atol: Double = 1e-8)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "is_close"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Double]; val y = b.asInstanceOf[Double]
    java.lang.Boolean.valueOf(
      math.abs(x - y) <= atol + rtol * math.abs(y) &&
        !java.lang.Double.isNaN(x) && !java.lang.Double.isNaN(y))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"(java.lang.Math.abs($a - $b) <= $atol + $rtol * java.lang.Math.abs($b))" +
        s" && !java.lang.Double.isNaN($a) && !java.lang.Double.isNaN($b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IsCloseTo = copy(left = newLeft, right = newRight)
}

/** Decode a tile's encoded `bytes` into a float32 pixel array —
  * the Spark-side replacement for the per-block `ReadAsArray`
  * (`/root/reference/runner.py:634-635`). Stays inside whole-stage
  * codegen via a static call. */
case class ImageDecode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_decode"

  override def nullSafeEval(bytes: Any, fmt: Any): Any =
    ImageDecode.decodeInternal(bytes.asInstanceOf[Array[Byte]],
      fmt.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, f) =>
      s"graft.functions.ImageDecode.decodeInternal($b, $f)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ImageDecode = copy(left = newLeft, right = newRight)
}

object ImageDecode {
  /** Catalyst-facing decode: returns ArrayData of floats. Wrapped as
    * UnsafeArrayData straight from the primitive float[] — no per-
    * pixel boxing (a 128² tile would otherwise allocate 16k Float
    * boxes per decode in expression pipelines). */
  def decodeInternal(bytes: Array[Byte], fmt: UTF8String): ArrayData = {
    val px = ImageCodec.decode(bytes, fmt.toString)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(px)
  }
}

/** Morton/Z-order cell id of (lon, lat) at a foldable level — the
  * engine's S2-style cell encoding (SURVEY.md §7) used for range
  * partitioning and manifest pruning. */
case class MortonCellId(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_id"

  override def nullSafeEval(lon: Any, lat: Any, level: Any): Any =
    java.lang.Long.valueOf(graft.geom.Morton.cellId(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      level.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, lvl) =>
      s"graft.geom.Morton.cellId($lon, $lat, $lvl)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): MortonCellId = copy(first = f, second = s, third = t)
}

/** XXH64 of a binary column (the tile `phash` generator). */
case class XxHash64Bytes(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xxh64"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(XXHash64.hash(v.asInstanceOf[Array[Byte]], seed))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.XXHash64.hash($b, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): XxHash64Bytes =
    copy(child = c)
}

/** Column-API façade over the engine's custom Catalyst expressions. */
object functions {
  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** numpy-semantics tolerance compare (nodata predicate). */
  def is_close(a: Column, b: Column): Column =
    col(IsCloseTo(expr(a.cast("double")), expr(b.cast("double"))))
  def is_close(a: Column, b: Column, rtol: Double, atol: Double): Column =
    col(IsCloseTo(expr(a.cast("double")), expr(b.cast("double")), rtol, atol))

  /** Decode `(bytes, fmt)` to `array<float>` pixels. */
  def image_decode(bytes: Column, fmt: Column): Column =
    col(ImageDecode(expr(bytes), expr(fmt)))

  /** Morton cell id at `level` for (lon, lat). */
  def cell_id(lon: Column, lat: Column, level: Column): Column =
    col(MortonCellId(expr(lon.cast("double")), expr(lat.cast("double")),
      expr(level.cast("int"))))

  /** XXH64 content hash of a binary column. */
  def xxh64(bytes: Column, seed: Long = 0L): Column =
    col(XxHash64Bytes(expr(bytes), seed))
}
