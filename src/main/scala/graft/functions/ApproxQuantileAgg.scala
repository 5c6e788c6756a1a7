package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KLL-style streaming quantile sketch (Karnin–Lang–Liberty, FOCS'16)
  * as a native `TypedImperativeAggregate` — the engine's fast
  * `approx_quantile` path. `graft_approx_quantile(v, p, k)` returns a
  * sample value whose rank is within ~O(1/k) of `p·n`.
  *
  * Why it exists (VERDICT r13 #1): Spark's `percentile_approx` rides
  * `QuantileSummaries` (Greenwald–Khanna), whose per-row update path
  * (object-boxed sample tuples, periodic O(buffer·log) compress with
  * allocation) was measured as the single 0.84 s stage flooring q49 at
  * sf0.1 — 60% of the query. This sketch's update is an append into a
  * primitive `Array[Double]` plus an amortized sort-half-discard
  * cascade: ~`log k` comparisons per row, zero allocation on the hot
  * path, mergeable partials (map-side combine works), bounded state.
  *
  * Structure: a ladder of buffers; items in level `h` carry weight
  * `2^h`. Level capacities shrink GEOMETRICALLY going down from the
  * top (`cap(depth d) = max(⌈k·(2/3)^d⌉, 8)`), the KLL trick that
  * keeps total state `O(k)` (≈3k doubles) no matter how many levels
  * `n` forces, while concentrating accuracy in the heavy top levels.
  * A full level is sorted and every other element promoted one level
  * up (its weight doubles), the classic compaction.
  *
  * Determinism: the canonical sketch flips a random coin per
  * compaction for the even/odd offset; this one flips a PER-LEVEL
  * alternating bit instead, so a given stream (in a given partition
  * order) always yields the same sketch, and successive compactions'
  * rank errors cancel in pairs rather than accumulate one-sided —
  * the standard derandomization. Merge order across partitions still
  * varies run to run (inherent to any distributed sketch); q49
  * therefore gates the BAND (|approx − exact| ≤ 1% of exact, with the
  * exact twin computed in the same query), not the raw value — the
  * same contract the HLL twins use.
  *
  * Error: with the random coin, KLL guarantees rank error
  * `ε ≈ 2.3/k^0.9` at 99% confidence (Apache DataSketches' fitted
  * constant); k=2048 puts ε under 0.3%, ~3× inside q49's 1% band
  * even before rank→value slack. [[ApproxQuantileAggSpec]] pins the
  * observed error an order tighter on uniform, Zipf, and adversarial
  * sorted streams, plus the merge-equivalence property.
  */
case class ApproxQuantileAgg(
    value: Expression,
    pctExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ApproxQuantileAgg.KllBuffer] {
  import ApproxQuantileAgg.KllBuffer

  // SQL fractional literals arrive as Decimal, not java.lang.Number
  private def numVal(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  private lazy val pct: Double = numVal(pctExpr.eval())
  private lazy val k: Int = numVal(kExpr.eval()).toInt

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!pctExpr.foldable || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage and k must be literals")
    else if (!value.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric value, got ${value.dataType.sql}")
    else if (!pctExpr.dataType.isInstanceOf[NumericType] ||
        !kExpr.dataType.isInstanceOf[NumericType])
      // checked BEFORE numVal forces: a foldable string literal would
      // otherwise escape to a bare MatchError instead of this failure
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage and k must be numeric, got " +
          s"${pctExpr.dataType.sql}, ${kExpr.dataType.sql}")
    else if (pctExpr.eval() == null || kExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage and k must not be null")
    else if (pct < 0.0 || pct > 1.0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage must be in [0, 1], got $pct")
    else if (k < 8 || k > (1 << 20))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be in [8, 2^20], got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(value, pctExpr, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_approx_quantile"

  private lazy val toDouble: Any => Double = value.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = value.eval(input)
    if (v != null) buf.add(toDouble(v))
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllBuffer): Any =
    if (buf.n == 0L) null else java.lang.Double.valueOf(buf.quantile(pct))

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    out.writeLong(buf.flips)
    out.writeInt(buf.numLevels)
    var h = 0
    while (h < buf.numLevels) {
      val sz = buf.sizes(h)
      out.writeInt(sz)
      var i = 0
      while (i < sz) { out.writeDouble(buf.levels(h)(i)); i += 1 }
      h += 1
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    buf.n = in.readLong()
    buf.flips = in.readLong()
    val nl = in.readInt()
    var h = 0
    while (h < nl) {
      val sz = in.readInt()
      buf.ensureLevel(h, sz)
      var i = 0
      while (i < sz) { buf.levels(h)(i) = in.readDouble(); i += 1 }
      buf.sizes(h) = sz
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxQuantileAgg =
    copy(value = newChildren(0), pctExpr = newChildren(1),
      kExpr = newChildren(2))
}

object ApproxQuantileAgg {

  private val MinCap = 8
  private val C = 2.0 / 3.0

  /** The sketch state: `levels(h)` holds `sizes(h)` unsorted doubles of
    * weight `2^h`; `flips` is the per-level compaction-offset bitset.
    * Arrays grow lazily to the level's current capacity (capacities
    * depend on the number of levels, which grows with `log(n/k)`).
    */
  final class KllBuffer(val k: Int) {
    var levels: Array[Array[Double]] = new Array[Array[Double]](0)
    var sizes: Array[Int] = new Array[Int](0)
    var n: Long = 0L
    var flips: Long = 0L

    def numLevels: Int = levels.length

    // memo of capOf(0) for the per-row add() check: capacities only
    // change when the ladder grows a level (a few dozen times over any
    // stream), but add() consults cap 0 on EVERY row — recomputing the
    // ceil/pow there was a measurable slice of the one hot path this
    // aggregate exists to make cheap
    private var cap0Memo: Int = MinCap
    private var cap0ForLevels: Int = -1
    private def cap0: Int = {
      if (cap0ForLevels != numLevels) {
        cap0Memo = capOf(0)
        cap0ForLevels = numLevels
      }
      cap0Memo
    }

    /** Capacity of level `h` given the current ladder height: top
      * level gets `k`, each level below shrinks by `c = 2/3`, floored
      * at [[MinCap]]. Adding a level on top implicitly shrinks lower
      * levels; they re-compact on their next overflow.
      */
    def capOf(h: Int): Int = {
      val depth = numLevels - 1 - h
      math.max(MinCap, math.ceil(k * math.pow(C, depth.toDouble)).toInt)
    }

    private[functions] def ensureLevel(h: Int, minRoom: Int): Unit = {
      if (h >= numLevels) {
        val nl = new Array[Array[Double]](h + 1)
        val ns = new Array[Int](h + 1)
        System.arraycopy(levels, 0, nl, 0, levels.length)
        System.arraycopy(sizes, 0, ns, 0, sizes.length)
        var i = levels.length
        while (i <= h) { nl(i) = new Array[Double](0); ns(i) = 0; i += 1 }
        levels = nl
        sizes = ns
      }
      val need = math.max(sizes(h) + minRoom, MinCap)
      if (levels(h).length < need) {
        // double (min 16) so the per-add path reallocates O(log cap)
        // times, not per insert; compaction bounds sizes, so growth
        // stops at ~cap + merge slack
        val grown = new Array[Double](
          math.max(need, math.max(levels(h).length * 2, 16)))
        System.arraycopy(levels(h), 0, grown, 0, sizes(h))
        levels(h) = grown
      }
    }

    def add(v: Double): Unit = {
      ensureLevel(0, 1)
      levels(0)(sizes(0)) = v
      sizes(0) += 1
      n += 1
      if (sizes(0) >= cap0) compactCascade(0)
    }

    /** Sort level `h`, promote every other element (alternating the
      * even/odd offset per level — the deterministic coin), clear the
      * level, cascade upward while any level overflows.
      */
    private def compactCascade(from: Int): Unit = {
      var h = from
      while (h < numLevels && sizes(h) >= math.max(capOf(h), 2)) {
        val sz = sizes(h)
        java.util.Arrays.sort(levels(h), 0, sz)
        // odd size: the smallest element stays at this level so total
        // weight is conserved exactly (Σ sizes(h)·2^h == n always);
        // the remaining EVEN count compacts — half promoted at double
        // weight, half discarded
        val base = sz & 1
        val m = sz - base
        val offset = base +
          (if (((flips >> (h & 63)) & 1L) == 0L) 0 else 1)
        flips ^= 1L << (h & 63)
        ensureLevel(h + 1, m / 2)
        val src = levels(h)
        val dst = levels(h + 1)
        var i = offset
        var o = sizes(h + 1)
        while (i < sz) { dst(o) = src(i); o += 1; i += 2 }
        sizes(h + 1) = o
        sizes(h) = base
        h += 1
      }
    }

    def mergeIn(other: KllBuffer): Unit = {
      var h = 0
      while (h < other.numLevels) {
        val osz = other.sizes(h)
        if (osz > 0) {
          ensureLevel(h, osz)
          System.arraycopy(other.levels(h), 0, levels(h), sizes(h), osz)
          sizes(h) += osz
        }
        h += 1
      }
      n += other.n
      // re-establish capacities bottom-up (a level pushed over by the
      // merge compacts; promotions may overflow the next level up)
      h = 0
      while (h < numLevels) {
        if (sizes(h) >= math.max(capOf(h), 2)) compactCascade(h)
        h += 1
      }
    }

    /** Smallest retained value whose cumulative weight reaches
      * `⌈p·n⌉` — the `percentile_approx` rank convention.
      */
    def quantile(p: Double): Double = {
      var total = 0
      var h = 0
      while (h < numLevels) { total += sizes(h); h += 1 }
      val vals = new Array[Double](total)
      val wts = new Array[Long](total)
      var o = 0
      h = 0
      while (h < numLevels) {
        val w = 1L << h
        var i = 0
        while (i < sizes(h)) { vals(o) = levels(h)(i); wts(o) = w; i += 1; o += 1 }
        h += 1
      }
      // indirect sort by value (small arrays — ≤ ~3k entries)
      val idx = Array.range(0, total).sortBy(vals(_))
      val wTotal = wts.sum
      val target = math.max(1L, math.ceil(p * wTotal).toLong)
      var cum = 0L
      var j = 0
      while (j < total) {
        cum += wts(idx(j))
        if (cum >= target) return vals(idx(j))
        j += 1
      }
      vals(idx(total - 1))
    }
  }
}
