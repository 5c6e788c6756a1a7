package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` best (score DESC, id ASC)
  * pairs per group in an O(k) heap, partial-aggregated map-side and
  * merged k-vs-k at the shuffle. Returns
  * `ARRAY<STRUCT<score: DOUBLE, id: BIGINT>>`, best first.
  *
  * Why it exists: it bounds the shuffle to k rows per (group × map
  * partition) with O(log k) heap inserts and no sort anywhere. Spark's
  * built-in WindowGroupLimit (3.5+) achieves the same shuffle bound
  * for the `row_number <= k` window pattern, but still sorts each
  * partition's survivors and only fires as an optimizer rewrite; the
  * aggregate form is explicit in the plan (ObjectHashAggregate),
  * sort-free, and composable — the ranked array is a value usable
  * inside further aggregation. Result sets are identical to the
  * window formulation because (score DESC, id ASC) is a total order.
  *
  * Ties are broken by the smaller id, matching the window's
  * `orderBy(desc(score), id)`. Rows with a NULL score or id are
  * ignored (a DESC window would sort null scores last instead — they
  * could only surface when a group has fewer than k non-null rows).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // max-first-by-WORSENESS ordering: the queue head is the worst kept
  // element — O(log k) evict when a better row arrives. Scores compare
  // via java.lang.Double.compare, which ranks NaN GREATEST — exactly
  // how Spark's (and DuckDB's) DESC sort orders NaN, so a NaN score
  // (e.g. a zero-norm cosine) ranks first here too, identical to the
  // window formulation. (A negate-and-compare ordering would instead
  // evict NaN as the worst element — divergent results.)
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val byScore = java.lang.Double.compare(b._1, a._1) // lower score = worse
        if (byScore != 0) byScore
        else java.lang.Long.compare(a._2, b._2) // larger id = worse
      }
    }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a literal")
    else if (score.dataType != DoubleType || id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (DOUBLE score, BIGINT id, INT k), got " +
          s"${score.dataType.sql}, ${id.dataType.sql}")
    // k's type gates BEFORE anything forces kExpr.eval(): a non-numeric
    // literal (graft_topk(s, id, 'x')) must be a clean analysis failure,
    // not a ClassCastException out of the Number cast below
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be an integral literal, got ${kExpr.dataType.sql}")
    else if (kExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must not be null")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val cand = (s.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(cand)
      else if (worstFirst.lt(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { cand =>
      if (buf.size < k) buf.enqueue(cand)
      else if (worstFirst.lt(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending under worstFirst = best first ("smaller" = better)
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
