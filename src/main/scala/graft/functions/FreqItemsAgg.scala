package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

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
  * eviction): the buffer carries a lazy candidate list of ALL entries
  * that sat at the minimum count when it was last rebuilt. Space-
  * Saving's minimum is non-decreasing and eviction inserts at min+1,
  * so the candidate set only SHRINKS between rebuilds — popped
  * candidates whose count has since grown (or whose entry slot was
  * recycled to a fresher key, which always enters above the minimum)
  * are skipped lazily, and only when the list empties does an
  * O(capacity) rescan run (once per distinct minimum value, ≤ n/m
  * times total). Victim choice is content-deterministic: lowest count,
  * ties by largest item.
  *
  * State layout (r15, VERDICT r14 #2 — the q125 profile): the
  * original `mutable.HashMap[UTF8String, Array[Long]]` buffer paid an
  * `Option` + entry-node allocation per probe and a boxed
  * tuple-array sort per merge trim, flooring the eviction fixture at
  * ~1 µs/row and ~30 ms per partial merge. The buffer is now three
  * dense parallel arrays (key, est, err) plus an open-addressing
  * int slot index (linear probing, backward-shift deletion) — the
  * update hot path is one hash, one probe chain, and one in-place
  * `+= 1`, with zero allocation on hits and one key clone on inserts;
  * eviction recycles the victim's ENTRY in place and only re-links
  * the index. Merge walks the dense arrays directly and trims by
  * sorting entry ids, not boxed tuples.
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

  override def update(
      buf: SsBuffer,
      input: InternalRow): SsBuffer = {
    val it = item.eval(input).asInstanceOf[UTF8String]
    if (it != null) {
      val e = buf.findEntry(it)
      if (e >= 0) buf.cnt(e) += 1 // in place: zero alloc on the hit path
      else if (buf.n < capacity)
        buf.append(it.clone(), 1L, 0L) // clone: eval may reuse its buffer
      else {
        // deterministic victim given the same counter CONTENT: lowest
        // estimate, ties by LARGEST item. The victim's dense entry is
        // recycled in place; only the index re-links.
        val v = buf.evictMinEntry()
        val minC = buf.curMin
        buf.replaceKeyAt(v, it.clone())
        buf.cnt(v) = minC + 1
        buf.er(v) = minC
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
    if (buf.n < capacity) 0L
    else {
      var m = Long.MaxValue
      var i = 0
      while (i < buf.n) { if (buf.cnt(i) < m) m = buf.cnt(i); i += 1 }
      m
    }

  override def merge(buf: SsBuffer, other: SsBuffer): SsBuffer = {
    val minBuf = absentBound(buf)
    val minOther = absentBound(other)
    if (minOther > 0) {
      // items only in buf: `other`'s stream may have held up to its
      // minimum of this item's mass before evicting it
      var i = 0
      while (i < buf.n) {
        if (other.findEntry(buf.keys(i)) < 0) {
          buf.cnt(i) += minOther; buf.er(i) += minOther
        }
        i += 1
      }
    }
    var j = 0
    while (j < other.n) {
      val k = other.keys(j)
      val e = buf.findEntry(k)
      if (e >= 0) { buf.cnt(e) += other.cnt(j); buf.er(e) += other.er(j) }
      else buf.append(k, other.cnt(j) + minBuf, other.er(j) + minBuf)
      j += 1
    }
    if (buf.n > capacity) {
      // deterministic trim: keep the top `capacity` by (est DESC,
      // item ASC) — only items whose upper bound trails the kept tail
      // are dropped, so survivors' bounds are unchanged
      buf.trimTo(capacity)
    }
    // merged counts moved arbitrarily (and trim may have dropped
    // candidates) — the lazy minimum cache is stale either way
    buf.invalidateCands()
    buf
  }

  override def eval(buf: SsBuffer): Any = {
    val order = buf.sortedIds()
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      val e = order(i)
      out(i) = InternalRow(buf.keys(e), buf.cnt(e), buf.er(e))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: SsBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      val kb = buf.keys(i).getBytes
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(buf.cnt(i)); out.writeLong(buf.er(i))
      i += 1
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
      buf.append(UTF8String.fromBytes(kb), in.readLong(), in.readLong())
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

  /** Aggregation buffer: dense parallel counter arrays + an
    * open-addressing slot index + the lazy eviction-candidate cache.
    *
    * Entries live densely in `keys/cnt/er[0, n)`; `idx` maps a probe
    * slot to entry-id+1 (0 = empty) under linear probing at ≤ 0.5
    * load, with backward-shift deletion so no tombstones accumulate
    * under eviction churn. `cands` holds the entry ids whose count
    * equalled `curMin` at the last rebuild, sorted by key ASC so
    * popping from the END yields the largest-key tie-break victim
    * first; the minimum is non-decreasing and every insert lands at
    * min+1, so stale ids (count moved on, or the entry recycled to a
    * newer key — which by the same argument sits above the minimum)
    * are skipped lazily. Rebuilt from scratch after any merge (counts
    * move arbitrarily); deliberately not serialized — derivable state.
    */
  final class SsBuffer {
    private[functions] var n = 0
    private[functions] var keys = new Array[UTF8String](16)
    private[functions] var cnt = new Array[Long](16)
    private[functions] var er = new Array[Long](16)
    // cached key hashCodes (r21): the index maintenance paths (probe,
    // unlink's backward shift, re-link, rehash) previously re-hashed
    // key BYTES on every touch — under eviction churn that is 3-4
    // murmur passes per evicted row. The cache turns every internal
    // hash into an int read; only findEntry hashes its PROBE key.
    private var hs = new Array[Int](16)
    // cached 8-byte big-endian unsigned key prefixes (r21): the
    // candidate rebuild and the eval/trim orders sort by KEY, and
    // UTF8String.compareTo byte loops dominated the q125 eviction
    // profile. Prefixes order identically to compareTo on the first
    // 8 bytes (unsigned compare, shorter keys zero-padded — a genuine
    // 0x00 byte ties and falls back), so sorts compare one long and
    // touch key bytes only on prefix ties.
    private var kp = new Array[Long](16)
    private var idx = new Array[Int](64)
    private var mask = 63
    private var cands = new Array[Int](0)
    private var nCands = 0
    private[functions] var curMin = -1L

    def size: Int = n

    /** Entry id of `k`, or -1. One hash, one probe chain, no alloc;
      * the cached-hash compare rejects probe-chain neighbours without
      * touching key bytes.
      */
    private[functions] def findEntry(k: UTF8String): Int = {
      val h = k.hashCode
      var s = h & mask
      while (true) {
        val e = idx(s)
        if (e == 0) return -1
        if (hs(e - 1) == h && keys(e - 1).equals(k)) return e - 1
        s = (s + 1) & mask
      }
      -1
    }

    private def putIndex(e: Int): Unit = {
      var s = hs(e) & mask
      while (idx(s) != 0) s = (s + 1) & mask
      idx(s) = e + 1
    }

    /** Unlink entry `e` from the index by backward-shift deletion:
      * later probe-chain members whose home slot precedes the hole
      * slide back, so chains stay contiguous with no tombstones. Slot
      * identity (idx(s) == e+1) replaces key equality — no byte
      * compares, no hashing.
      */
    private def removeIndexEntry(e: Int): Unit = {
      var s = hs(e) & mask
      while (idx(s) != e + 1) s = (s + 1) & mask
      var hole = s
      var j = (hole + 1) & mask
      while (idx(j) != 0) {
        val home = hs(idx(j) - 1) & mask
        if (((j - home) & mask) >= ((j - hole) & mask)) {
          idx(hole) = idx(j); hole = j
        }
        j = (j + 1) & mask
      }
      idx(hole) = 0
    }

    private def rehash(newCap: Int): Unit = {
      idx = new Array[Int](newCap)
      mask = newCap - 1
      var e = 0
      while (e < n) { putIndex(e); e += 1 }
    }

    /** Append a NEW entry (key must be absent and owned by this
      * buffer — callers clone when the source may reuse its bytes).
      */
    /** First 8 key bytes as a big-endian unsigned long (0-padded). */
    private def prefix64(k: UTF8String): Long = {
      val len = math.min(k.numBytes, 8)
      var p = 0L
      var i = 0
      while (i < len) { p = (p << 8) | (k.getByte(i) & 0xffL); i += 1 }
      p << (8 * (8 - len))
    }

    /** Key order (lexicographic bytes): prefix longs first, full
      * compare only on a prefix tie. Entries have UNIQUE keys, so the
      * order is total.
      */
    private def keyLess(a: Int, b: Int): Boolean = {
      val pa = kp(a); val pb = kp(b)
      if (pa != pb) java.lang.Long.compareUnsigned(pa, pb) < 0
      else keys(a).compareTo(keys(b)) < 0
    }

    private[functions] def append(k: UTF8String, c: Long, e: Long): Unit = {
      if (n == keys.length) {
        keys = java.util.Arrays.copyOf(keys, n * 2)
        cnt = java.util.Arrays.copyOf(cnt, n * 2)
        er = java.util.Arrays.copyOf(er, n * 2)
        hs = java.util.Arrays.copyOf(hs, n * 2)
        kp = java.util.Arrays.copyOf(kp, n * 2)
      }
      keys(n) = k; cnt(n) = c; er(n) = e; hs(n) = k.hashCode
      kp(n) = prefix64(k)
      n += 1
      if (2 * n > idx.length) rehash(idx.length * 2) // re-links everything
      else putIndex(n - 1)
    }

    /** Recycle entry `e`'s slot for a new key: unlink the old key,
      * overwrite in place, re-link. The caller sets cnt/er.
      */
    private[functions] def replaceKeyAt(e: Int, k: UTF8String): Unit = {
      removeIndexEntry(e)
      keys(e) = k
      hs(e) = k.hashCode
      kp(e) = prefix64(k)
      putIndex(e)
    }

    /** In-place quicksort of entry ids by key ASC (r21: replaces the
      * boxed-Integer comparator sort in the candidate rebuild — the
      * rebuild runs once per distinct minimum and sorted ~capacity ids
      * through an object sort with per-compare unboxing). Recurses on
      * the SMALLER partition and loops on the larger (r22, ADVICE:
      * capacity is caller-supplied, and a middle-element pivot alone
      * would give O(n) stack depth on adversarial orderings; this
      * bounds the stack at O(log n) like the TimSort it replaced).
      */
    private def sortIdsByKey(a: Array[Int], lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo >= 1) {
        if (hi - lo < 12) { // insertion sort for small runs
          var i = lo + 1
          while (i <= hi) {
            val v = a(i)
            var j = i - 1
            while (j >= lo && keyLess(v, a(j))) {
              a(j + 1) = a(j); j -= 1
            }
            a(j + 1) = v
            i += 1
          }
          return
        }
        val pivot = a(lo + (hi - lo) / 2)
        var i = lo; var j = hi
        while (i <= j) {
          while (keyLess(a(i), pivot)) i += 1
          while (keyLess(pivot, a(j))) j -= 1
          if (i <= j) { val t = a(i); a(i) = a(j); a(j) = t; i += 1; j -= 1 }
        }
        if (j - lo < hi - i) { sortIdsByKey(a, lo, j); lo = i }
        else { sortIdsByKey(a, i, hi); hi = j }
      }
    }

    /** Entry id of the eviction victim (lowest count, ties by largest
      * key) via the lazy candidate cache; sets `curMin` to its count.
      */
    private[functions] def evictMinEntry(): Int = {
      while (true) {
        if (nCands == 0) {
          var m = Long.MaxValue
          var i = 0
          while (i < n) { if (cnt(i) < m) m = cnt(i); i += 1 }
          curMin = m
          var c = 0
          i = 0
          while (i < n) { if (cnt(i) == m) c += 1; i += 1 }
          if (cands.length < c) cands = new Array[Int](c)
          c = 0; i = 0
          while (i < n) {
            if (cnt(i) == m) { cands(c) = i; c += 1 }
            i += 1
          }
          sortIdsByKey(cands, 0, c - 1)
          nCands = c
        }
        nCands -= 1
        val e = cands(nCands)
        if (cnt(e) == curMin) return e
      }
      -1
    }

    private[functions] def invalidateCands(): Unit = {
      nCands = 0; curMin = -1L
    }

    /** Entry ids sorted by (est DESC, key ASC) — the eval/trim order. */
    private[functions] def sortedIds(): Array[Int] = {
      val ids = new Array[Int](n)
      var i = 0
      while (i < n) { ids(i) = i; i += 1 }
      sortIdsByEst(ids, 0, n - 1)
      ids
    }

    /** (est DESC, key ASC) order between entry ids. */
    private def estLess(x: Int, p: Int): Boolean = {
      val cx = cnt(x); val cp = cnt(p)
      cx > cp || (cx == cp && keyLess(x, p))
    }

    /** In-place quicksort by (est DESC, key ASC); keys are unique, so
      * the order is total and stability is moot. Same smaller-partition
      * recursion bound as [[sortIdsByKey]] (r22).
      */
    private def sortIdsByEst(a: Array[Int], lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo >= 1) {
        if (hi - lo < 12) {
          var i = lo + 1
          while (i <= hi) {
            val v = a(i)
            var j = i - 1
            while (j >= lo && estLess(v, a(j))) { a(j + 1) = a(j); j -= 1 }
            a(j + 1) = v
            i += 1
          }
          return
        }
        val p = a(lo + (hi - lo) / 2)
        var i = lo; var j = hi
        while (i <= j) {
          while (estLess(a(i), p)) i += 1
          while (estLess(p, a(j))) j -= 1
          if (i <= j) { val t = a(i); a(i) = a(j); a(j) = t; i += 1; j -= 1 }
        }
        if (j - lo < hi - i) { sortIdsByEst(a, lo, j); lo = i }
        else { sortIdsByEst(a, i, hi); hi = j }
      }
    }

    /** Keep the top `capacity` entries by (est DESC, key ASC) and
      * rebuild the dense arrays + index.
      */
    private[functions] def trimTo(capacity: Int): Unit = {
      val order = sortedIds()
      val m = math.min(capacity, n)
      val nk = new Array[UTF8String](keys.length)
      val nc = new Array[Long](keys.length)
      val ne = new Array[Long](keys.length)
      val nh = new Array[Int](keys.length)
      val np = new Array[Long](keys.length)
      var i = 0
      while (i < m) {
        val e = order(i)
        nk(i) = keys(e); nc(i) = cnt(e); ne(i) = er(e); nh(i) = hs(e)
        np(i) = kp(e)
        i += 1
      }
      keys = nk; cnt = nc; er = ne; hs = nh; kp = np
      n = m
      java.util.Arrays.fill(idx, 0)
      var e = 0
      while (e < n) { putIndex(e); e += 1 }
    }

    // ---- inspection views (spec/debug surface; not hot paths) ----

    def contains(k: UTF8String): Boolean = findEntry(k) >= 0

    /** Current (est, err) of `k` as a fresh pair; throws if absent. */
    def apply(k: UTF8String): Array[Long] = {
      val e = findEntry(k)
      require(e >= 0, s"item not tracked: $k")
      Array(cnt(e), er(e))
    }

    def iterator: Iterator[(UTF8String, Array[Long])] =
      (0 until n).iterator.map(i => keys(i) -> Array(cnt(i), er(i)))

    def foreach[U](f: ((UTF8String, Array[Long])) => U): Unit =
      iterator.foreach(f)

    def map[T](f: ((UTF8String, Array[Long])) => T): Iterator[T] =
      iterator.map(f)

    def valuesIterator: Iterator[Array[Long]] =
      (0 until n).iterator.map(i => Array(cnt(i), er(i)))
  }
}
