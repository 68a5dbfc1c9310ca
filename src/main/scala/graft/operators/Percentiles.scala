package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Exact percentiles with numpy's linear-interpolation semantics over
  * float32 values — the reference concatenates per-FID float32 chunks
  * and calls `np.percentile` (`/root/reference/runner.py:823-904`).
  *
  * numpy 1.26 detail replicated here (verified against numpy 1.26.4):
  * `_lerp` computes `diff = b - a` in the array dtype (float32) but
  * the interpolation `a + diff*t` — and the `t >= 0.5` branch
  * `b - diff*(1-t)` — in float64, because the position array `t` is a
  * float64 ndarray which upcasts the elementwise ops. Position is
  * `(p/100) * (n-1)` in float64; result dtype is float64.
  */
object NumpyPercentile {
  def compute(sortedVals: Array[Float], ps: Array[Double]): Array[Double] = {
    val n = sortedVals.length
    val out = new Array[Double](ps.length)
    var k = 0
    while (k < ps.length) {
      out(k) =
        if (n == 0) Double.NaN
        else if (n == 1) sortedVals(0).toDouble
        else {
          val pos = (ps(k) / 100.0) * (n - 1)
          val i = math.floor(pos).toInt
          val t = pos - i
          val a = sortedVals(i)
          val b = sortedVals(math.min(i + 1, n - 1))
          val diff = (b - a).toDouble // float32 subtract, as numpy does
          if (t >= 0.5) b.toDouble - diff * (1.0 - t)
          else a.toDouble + diff * t
        }
      k += 1
    }
    out
  }
}

/** Typed aggregator concatenating float32 value chunks and finishing
  * with exact numpy percentiles. Parity mode only — at 100 TB scale
  * the engine's scale path is a sketch (t-digest) behind a flag; this
  * aggregator is the exact oracle-matching path. Returns null (→ SQL
  * NULL percentiles) for empty groups, matching `runner.py:891-904`
  * where groups with no chunks keep their None percentile fields.
  */
class PercentileAgg(ps: Array[Double])
    extends Aggregator[Array[Float], Array[Float], Array[Double]] {
  override def zero: Array[Float] = Array.empty[Float]
  override def reduce(buf: Array[Float], in: Array[Float]): Array[Float] =
    if (in == null || in.isEmpty) buf
    else if (buf.isEmpty) in
    else buf ++ in
  override def merge(a: Array[Float], b: Array[Float]): Array[Float] =
    if (a.isEmpty) b else if (b.isEmpty) a else a ++ b
  override def finish(buf: Array[Float]): Array[Double] =
    if (buf.isEmpty) null
    else {
      val s = buf.clone()
      java.util.Arrays.sort(s)
      NumpyPercentile.compute(s, ps)
    }
  override def bufferEncoder: Encoder[Array[Float]] =
    ExpressionEncoder[Array[Float]]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
