package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact distinct-count of an integral key over a PRIMITIVE open-
  * addressing long set — `graft_exact_distinct(k)` ≡
  * `count(DISTINCT k)` (NULLs skipped), as a single mergeable
  * aggregate instead of Spark's Expand + two-level aggregation.
  *
  * Why it exists (r14, the q49 single-scan shape): SQL
  * `count(DISTINCT a), count(DISTINCT b)` in one agg plans as an
  * Expand (input ×(distincts+1)) feeding every aggregate's update
  * path — the r8 29.6 s trap — and the distinct-frame workaround costs
  * one extra scan + shuffle PER distinct column. With the distinct
  * count as a plain mergeable aggregate, q49's six statistics ride ONE
  * scan and ONE ObjectHashAggregate: update is a linear-probe insert
  * into an `Array[Long]` (~5 ns amortized, zero boxing), merge is a
  * set union, eval is the set size.
  *
  * SCALE CONTRACT — the SMALL-REGIME half of a dual regime, like
  * [[ExactPercentileAgg]]: state is O(distinct keys) per group (8–16
  * bytes each), exactly what the distinct-frame/count-over-groupBy
  * form exists to avoid when the key space is open-ended. Callers
  * route here only under a bounded probe (q49's 128 MiB cut); the
  * forced-distributed gate pins the shuffle-keyed form.
  */
case class ExactDistinctAgg(
    key: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExactDistinctAgg.LongSet] {
  import ExactDistinctAgg.LongSet

  override def checkInputDataTypes(): TypeCheckResult =
    key.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral key, got ${other.sql}")
    }

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_exact_distinct"

  private lazy val toLong: Any => Long = key.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
    case _ => v => v.asInstanceOf[Number].longValue()
  }

  override def createAggregationBuffer(): LongSet = new LongSet

  override def update(buf: LongSet, input: InternalRow): LongSet = {
    val v = key.eval(input)
    if (v != null) buf.add(toLong(v))
    buf
  }

  override def merge(buf: LongSet, other: LongSet): LongSet = {
    if (other.hasZero) buf.hasZero = true
    val slots = other.slots
    var i = 0
    while (i < slots.length) {
      if (slots(i) != 0L) buf.add(slots(i))
      i += 1
    }
    buf
  }

  override def eval(buf: LongSet): Any =
    java.lang.Long.valueOf(buf.count + (if (buf.hasZero) 1L else 0L))

  override def serialize(buf: LongSet): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(buf.count * 8 + 8)
    val out = new DataOutputStream(bytes)
    out.writeBoolean(buf.hasZero)
    out.writeInt(buf.count)
    val slots = buf.slots
    var i = 0
    while (i < slots.length) {
      if (slots(i) != 0L) out.writeLong(slots(i))
      i += 1
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LongSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new LongSet
    buf.hasZero = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactDistinctAgg =
    copy(key = newChildren(0))
}

object ExactDistinctAgg {

  /** Open-addressing linear-probe long set; 0 is the empty-slot
    * sentinel, so a true 0 key is tracked in [[hasZero]]. Load factor
    * ½, power-of-two capacity, splitmix64 finalizer for the probe
    * start (public-domain avalanche constants, Steele et al.).
    */
  final class LongSet {
    var slots: Array[Long] = new Array[Long](32)
    var count: Int = 0
    var hasZero: Boolean = false

    private def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }

    def add(v: Long): Unit = {
      if (v == 0L) { hasZero = true; return }
      if ((count + 1) * 2 > slots.length) grow()
      val mask = slots.length - 1
      var i = (mix(v).toInt) & mask
      while (slots(i) != 0L) {
        if (slots(i) == v) return
        i = (i + 1) & mask
      }
      slots(i) = v
      count += 1
    }

    private def grow(): Unit = {
      val old = slots
      slots = new Array[Long](old.length * 2)
      count = 0
      var i = 0
      while (i < old.length) {
        if (old(i) != 0L) add(old(i))
        i += 1
      }
    }
  }
}
