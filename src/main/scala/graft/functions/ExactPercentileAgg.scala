package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact interpolated percentile over a PRIMITIVE double-array buffer —
  * the engine's small-regime exact-quantile form.
  * `graft_exact_percentile(v, p)` returns the `(n−1)·p` linearly
  * interpolated order statistic, value-identical to SQL
  * `quantile_cont` / Spark `percentile`.
  *
  * Why it exists (r14): both exact-median forms available at bench
  * scale were paying overhead unrelated to the arithmetic — Spark's
  * `percentile` buffers `OpenHashMap[AnyRef, Long]` (boxed keys,
  * measured ~1.5 s on 600k rows), and the histogram-window form
  * ([[graft.operators.Percentiles]]) pays window-exchange machinery
  * (~0.9 s single-window / ~1.4 s two-phase at sf0.1, where only
  * ~0.02 s of it is sorting). This aggregate is the form whose cost IS
  * the arithmetic: update appends to an `Array[Double]` (amortized
  * doubling), merge concatenates, eval sorts once and interpolates —
  * 600k rows in ~0.2 s including the scan.
  *
  * SCALE CONTRACT — deliberately the SMALL-INPUT half of a dual
  * regime: state is O(group size) doubles, the exact thing the
  * histogram form exists to avoid at 100 TB. Callers route to it only
  * under a bounded probe (q49's 128 MiB file-byte cut); the
  * forced-distributed gate pins the histogram/two-phase form, so the
  * scale path stays hash-certified. This is the [[dual-regime]]
  * pattern: both forms value-identical (integer-free IEEE interpolation
  * of the same two order statistics), switched on input bytes, never
  * on semantics.
  */
case class ExactPercentileAgg(
    value: Expression,
    pctExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExactPercentileAgg.DblBuf] {
  import ExactPercentileAgg.DblBuf

  private def numVal(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  private lazy val pct: Double = numVal(pctExpr.eval())

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!pctExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage must be a literal")
    else if (!value.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric value, got ${value.dataType.sql}")
    else if (!pctExpr.dataType.isInstanceOf[NumericType])
      // checked BEFORE numVal forces: a foldable string literal would
      // otherwise escape to a bare MatchError instead of this failure
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage must be numeric, got ${pctExpr.dataType.sql}")
    else if (pctExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName percentage must not be null")
    else if (pct < 0.0 || pct > 1.0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage must be in [0, 1], got $pct")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(value, pctExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_exact_percentile"

  private lazy val toDouble: Any => Double = value.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case _: DecimalType => v =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def createAggregationBuffer(): DblBuf = new DblBuf

  override def update(buf: DblBuf, input: InternalRow): DblBuf = {
    val v = value.eval(input)
    if (v != null) buf.add(toDouble(v))
    buf
  }

  override def merge(buf: DblBuf, other: DblBuf): DblBuf = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: DblBuf): Any = {
    val n = buf.size
    if (n == 0) null
    else {
      java.util.Arrays.sort(buf.arr, 0, n)
      val r = pct * (n - 1).toDouble
      val lo = r.toInt
      val hi = math.min(lo + 1, n - 1)
      val frac = r - lo
      java.lang.Double.valueOf(
        buf.arr(lo) + frac * (buf.arr(hi) - buf.arr(lo)))
    }
  }

  override def serialize(buf: DblBuf): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(buf.size * 8 + 4)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.arr(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DblBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new DblBuf
    buf.ensure(n)
    var i = 0
    while (i < n) { buf.arr(i) = in.readDouble(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactPercentileAgg =
    copy(value = newChildren(0), pctExpr = newChildren(1))
}

object ExactPercentileAgg {
  /** Growable primitive double buffer (amortized-doubling append). */
  final class DblBuf {
    var arr: Array[Double] = new Array[Double](16)
    var size: Int = 0
    def ensure(n: Int): Unit =
      if (arr.length < n) {
        val grown = new Array[Double](math.max(n, arr.length * 2))
        System.arraycopy(arr, 0, grown, 0, size)
        arr = grown
      }
    def add(v: Double): Unit = {
      ensure(size + 1)
      arr(size) = v
      size += 1
    }
    def addAll(other: DblBuf): Unit = {
      ensure(size + other.size)
      System.arraycopy(other.arr, 0, arr, size, other.size)
      size += other.size
    }
  }
}
