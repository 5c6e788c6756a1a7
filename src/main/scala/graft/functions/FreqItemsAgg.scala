package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters aggregate (Metwally et al.): tracks at
  * most `capacity` distinct items per group in bounded state, partial-
  * aggregated map-side and merged counter-wise at the shuffle. Returns
  * `ARRAY<STRUCT<item: STRING, est: LONG, err: LONG>>`, highest
  * estimate first (ties by item ASC).
  *
  * Why it exists: exact token/domain/n-gram frequency at 100 TB means
  * shuffling the full distinct-key space — fine for a vocabulary,
  * fatal for open-ended keys (URLs, hosts, error strings). Space-
  * Saving bounds state to `capacity` counters with the classic
  * guarantee `est − err ≤ true ≤ est` and absolute error ≤ n/capacity
  * per partial. Merge is the mergeable-summaries combine (Agarwal et
  * al., PODS'12): matched items SUM both fields, and an item present
  * in only one side additionally absorbs the ABSENT side's minimum
  * counter into est and err — a saturated partial may have evicted
  * that item with up to its current minimum of mass, so the minimum is
  * exactly the correction that keeps `true ≤ est` (and the widened
  * err keeps `est − err ≤ true`) through partial aggregation. An
  * unsaturated partial has never evicted, so its absent-side
  * correction is 0 and the exact regime stays exact. The post-merge
  * trim only discards items whose upper bound trails the kept tail,
  * and the kept minimum then still upper-bounds anything absent.
  *
  * Two regimes, documented deliberately:
  *  - `capacity ≥` the group's distinct-item count: NO evictions
  *    anywhere — every `err` is 0, estimates are EXACT counts, and the
  *    result equals the groupBy-count answer deterministically (this
  *    is the oracle-gated regime, q123).
  *  - under eviction: estimates are order-dependent within the
  *    guarantee (which counter a new item displaces depends on arrival
  *    order — inherent to the sketch, same as any streaming summary);
  *    the spec gates the top-k RECOVERY and the error bound on a
  *    planted Zipf stream instead of exact values.
  *
  * Eviction is amortized O(1) (r13; was an O(capacity) scan per
  * eviction, which at capacity 8k on a heavy-tail stream was ~10^10
  * comparisons — the q125 fixture took minutes): the buffer carries a
  * lazy candidate list of ALL keys that sat at the minimum count when
  * it was last rebuilt. Space-Saving's minimum is non-decreasing and
  * eviction inserts at min+1, so the candidate set only SHRINKS
  * between rebuilds — popped candidates whose count has since grown
  * are skipped (lazy deletion), and only when the list empties does an
  * O(capacity) rescan run (once per distinct minimum value, ≤ n/m
  * times total). Victim choice is unchanged and content-deterministic:
  * lowest count, ties by largest item (candidates are sorted at
  * rebuild; later entrants can never rejoin the current minimum).
  */
case class FreqItemsAgg(
    item: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqItemsAgg.SsBuffer] {
  import FreqItemsAgg.SsBuffer

  private lazy val capacity: Int =
    capExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!capExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName capacity must be a literal")
    else if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING item, INT capacity), got " +
          item.dataType.sql)
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(capExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName capacity must be an integral literal, got " +
          capExpr.dataType.sql)
    else if (capExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName capacity must not be null")
    else if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName capacity must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(item, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): SsBuffer = new SsBuffer

  // deterministic eviction victim given the same counter CONTENT:
  // lowest estimate, ties by LARGEST item (so the surviving set under
  // ties prefers smaller items, matching the eval order's tie-break).
  // Amortized O(1) via the buffer's lazy candidate list (class doc):
  // pollLast on the ASC-sorted candidates IS the largest-at-minimum
  // rule; a popped key whose count moved past the minimum is skipped;
  // an empty list triggers the once-per-minimum-value O(capacity)
  // rebuild.
  private def evictMin(buf: SsBuffer): (UTF8String, Long) = {
    var victim: UTF8String = null
    while (victim == null) {
      val k = buf.cands.pollLast()
      if (k == null) {
        var m = Long.MaxValue
        buf.foreach { case (_, v) => if (v(0) < m) m = v(0) }
        val ks = buf.iterator
          .collect { case (k2, v) if v(0) == m => k2 }.toArray
        java.util.Arrays.sort(ks,
          (a: UTF8String, b: UTF8String) => a.compareTo(b))
        buf.curMin = m
        var i = 0
        while (i < ks.length) { buf.cands.addLast(ks(i)); i += 1 }
      } else if (buf.get(k).exists(_(0) == buf.curMin)) victim = k
    }
    (victim, buf.curMin)
  }

  override def update(
      buf: SsBuffer,
      input: InternalRow): SsBuffer = {
    val it = item.eval(input).asInstanceOf[UTF8String]
    if (it != null) {
      buf.get(it) match {
        case Some(v) => v(0) += 1 // in place: zero alloc on the hit path
        case None if buf.size < capacity =>
          buf(it.clone()) = Array(1L, 0L) // clone: eval may reuse its buffer
        case None =>
          val (victim, minC) = evictMin(buf)
          buf.remove(victim)
          buf(it.clone()) = Array(minC + 1, minC)
      }
    }
    buf
  }

  // the largest count an item absent from `buf` could have accumulated
  // in buf's stream: a saturated buffer may have evicted it with up to
  // the current minimum counter of mass (Space-Saving's minimum is
  // non-decreasing, and the merge/trim paths preserve the invariant —
  // see the class doc); an unsaturated buffer has never evicted or
  // trimmed, so absence means a true count of zero
  private def absentBound(buf: SsBuffer): Long =
    if (buf.size < capacity) 0L
    else buf.valuesIterator.map(_(0)).min

  override def merge(buf: SsBuffer, other: SsBuffer): SsBuffer = {
    val minBuf = absentBound(buf)
    val minOther = absentBound(other)
    if (minOther > 0) {
      // items only in buf: `other`'s stream may have held up to its
      // minimum of this item's mass before evicting it
      buf.foreach { case (k, v) =>
        if (!other.contains(k)) { v(0) += minOther; v(1) += minOther }
      }
    }
    other.foreach { case (k, v1) =>
      buf.get(k) match {
        case Some(v0) => v0(0) += v1(0); v0(1) += v1(1)
        case None => buf(k) = Array(v1(0) + minBuf, v1(1) + minBuf)
      }
    }
    if (buf.size > capacity) {
      // deterministic trim: keep the top `capacity` by (est DESC,
      // item ASC) — only items whose upper bound trails the kept tail
      // are dropped, so survivors' bounds are unchanged
      val keep = buf.toArray
        .sortWith { case ((k1, v1), (k2, v2)) =>
          if (v1(0) != v2(0)) v1(0) > v2(0) else k1.compareTo(k2) < 0
        }
        .take(capacity)
      buf.clear()
      keep.foreach { case (k, v) => buf(k) = v }
    }
    // merged counts moved arbitrarily (and trim may have dropped
    // candidates) — the lazy minimum cache is stale either way
    buf.invalidateCands()
    buf
  }

  override def eval(buf: SsBuffer): Any = {
    val sorted = buf.toArray
      .sortWith { case ((k1, v1), (k2, v2)) =>
        if (v1(0) != v2(0)) v1(0) > v2(0) else k1.compareTo(k2) < 0
      }
    new GenericArrayData(sorted.map { case (k, v) =>
      InternalRow(k, v(0), v(1))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: SsBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val kb = k.getBytes
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(v(0)); out.writeLong(v(1))
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf(UTF8String.fromBytes(kb)) = Array(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(item = newChildren(0), capExpr = newChildren(1))
}

object FreqItemsAgg {

  /** Aggregation buffer: the Space-Saving counter table plus the lazy
    * eviction-candidate cache. `cands` holds every key whose count
    * equalled `curMin` when the cache was last rebuilt, sorted ASC so
    * `pollLast` yields the largest-key tie-break victim first. The
    * minimum is non-decreasing and evictions insert at min+1, so the
    * candidate set only shrinks between rebuilds; entries whose count
    * has moved on are skipped lazily. Rebuilt from scratch after any
    * merge (counts move arbitrarily) and after deserialization (the
    * cache is deliberately not serialized — it is derivable state).
    */
  final class SsBuffer extends mutable.HashMap[UTF8String, Array[Long]] {
    private[functions] var curMin: Long = -1L
    private[functions] val cands = new java.util.ArrayDeque[UTF8String]()
    private[functions] def invalidateCands(): Unit = {
      cands.clear(); curMin = -1L
    }
  }
}
