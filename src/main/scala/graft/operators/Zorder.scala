package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional file
  * pruning for the write side. A table range-sorted on ONE column
  * prunes scans filtered on that column and nothing else; a 100 TB
  * corpus queried by `(customer, date)` or `(source, quality, date)`
  * wants EVERY predicate to hit parquet min/max stats. Interleaving
  * the dimensions' bits gives a single sort key whose ranges are
  * axis-aligned boxes: after `zorderBy`, every file's min/max
  * footprint is tight in ALL dimensions, so any predicate (or
  * several) skips files — the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, here as a plain repartition+sort any
  * parquet write can use.
  *
  * [[zkey]]/[[zkeyN]] are pure codegen'd column arithmetic (the
  * classic mask-cascade spread — shift/or/and on longs, no UDF, no
  * allocation), so a key costs ~10–20 integer ops per row inside
  * whole-stage codegen and is exactly mirrorable in SQL (`<<`, `|`,
  * `&` exist in every engine) — the q133 (2-D) and q155 (3-D)
  * oracles pin the bit layouts.
  *
  * Dimensionality (r16 VERDICT #7 — real clustering keys are often
  * 3–4 columns): 2, 3, or 4 dims share one 62-bit budget — 31/21/15
  * bits per dim respectively, each with its own published spread
  * cascade (strides 2/3/4), highest bit position 61/62/59 — always
  * sign-safe. Beyond 4 dims the per-dim resolution (≤ 12 bits)
  * stops buying pruning; split the key or bucket a dimension
  * instead.
  *
  * Scale shape: [[zorderBy]] is ONE stats aggregate (min/max of the
  * key columns — a broadcast-sized row) + one range repartition on
  * the key + in-partition sort: exactly the cost of a global sort on
  * one column, which is what it replaces.
  */
object Zorder {

  /** Per-dimension bit budget: the largest b with the top interleaved
    * bit position b·d − 1 ≤ 62 (sign-safe) for which a power-of-two
    * mask cascade exists.
    */
  def bitsFor(d: Int): Int = d match {
    case 2 => 31
    case 3 => 21
    case 4 => 15
    case _ => throw new IllegalArgumentException(
      s"z-order supports 2..4 dimensions, got $d")
  }

  /** Interleave the low 31 bits of two nonnegative longs: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1 — the 2-D Morton
    * code, < 2⁶³ (sign-safe) by construction. Inputs are clamped to
    * [0, 2³¹−1]; map real domains into that range first
    * ([[scaled]] or any affine bucketing) — clamping is a floor/cap,
    * not wraparound, so out-of-domain values still sort to the curve's
    * edges. NULL in either column propagates NULL (callers coalesce
    * to a sentinel bucket first; [[zorderBy]] does).
    */
  def zkey(x: Column, y: Column): Column = zkeyN(Seq(x, y))

  /** The d-dimensional Morton code of 2–4 nonnegative longs: bit i of
    * dimension j lands at position i·d + j (dimension 0 owns the
    * LOWEST bit — ties on the curve break toward earlier dims, the
    * same layout as [[zkey]]). Each input clamps to
    * [0, 2^bitsFor(d) − 1]; NULL in any dimension propagates NULL.
    */
  def zkeyN(dims: Seq[Column]): Column = {
    val d = dims.length
    val b = bitsFor(d)
    dims.zipWithIndex.map { case (c, j) =>
      val sp = spreadN(clampBits(c, b), d)
      if (j == 0) sp else shiftleft(sp, j)
    }.reduce(_.bitwiseOR(_))
  }

  private def clampBits(c: Column, bits: Int): Column =
    greatest(lit(0L), least(c.cast("long"), lit((1L << bits) - 1)))

  /** The published spread cascades, as (shift, mask) steps: stride 2
    * spreads 31 bits to even positions in 5 steps, stride 3 spreads
    * 21 bits to every third position in 5, stride 4 spreads 15 bits
    * to every fourth in 4. Exposed to the query pack so the SQL
    * oracles embed the IDENTICAL constants rather than a re-derived
    * copy that could drift.
    */
  private[graft] val SpreadSteps: Map[Int, Seq[(Int, Long)]] = Map(
    2 -> Seq(
      16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L),
    3 -> Seq(
      32 -> 0x001F00000000FFFFL, 16 -> 0x001F0000FF0000FFL,
      8 -> 0x100F00F00F00F00FL, 4 -> 0x10C30C30C30C30C3L,
      2 -> 0x1249249249249249L),
    4 -> Seq(
      24 -> 0x000000FF000000FFL, 12 -> 0x000F000F000F000FL,
      6 -> 0x0303030303030303L, 3 -> 0x1111111111111111L))

  /** Mask-cascade spread of the low bitsFor(d) bits of a long to
    * every d-th position (positions 0, d, 2d, …).
    */
  private def spreadN(c: Column, d: Int): Column =
    SpreadSteps(d).foldLeft(c) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** Affine-scale a numeric column into the curve's [0, 2^bits)
    * domain given its min/max (from the caller's one stats pass).
    * Degenerate ranges (min = max) map to 0. Layout-only arithmetic:
    * the double rounding here steers file placement, never a result
    * value.
    */
  def scaled(c: Column, minV: Column, maxV: Column,
      bits: Int = 21): Column = {
    val span = maxV.cast("double") - minV.cast("double")
    when(span <= 0.0, lit(0L)).otherwise(
      floor((c.cast("double") - minV.cast("double")) / span *
        lit((1L << bits) - 1)).cast("long"))
  }

  /** Rewrite `df` into `numPartitions` z-ordered output partitions on
    * `(c1, c2)` — the 2-D form of [[zorderByN]]. */
  def zorderBy(df: DataFrame, c1: String, c2: String,
      numPartitions: Int): DataFrame =
    zorderByN(df, Seq(c1, c2), numPartitions)

  /** Rewrite `df` into `numPartitions` z-ordered output partitions on
    * 2–4 columns: min/max stats (one tiny agg, broadcast back), scale
    * every column onto the curve, range-repartition + in-partition
    * sort by the interleaved key. Write the result with any sink —
    * each output file's min/max footprint is then a compact curve
    * segment in every dimension. A NULL in ANY key column sorts first
    * via a −1 sentinel bucket (below the curve), matching NULLS FIRST
    * range-sort semantics.
    */
  def zorderByN(df: DataFrame, cols: Seq[String],
      numPartitions: Int): DataFrame = {
    val d = cols.length
    val curveBits = math.min(21, bitsFor(d))
    val aggExprs = cols.indices.flatMap(i => Seq(
      min(col(cols(i))).as(s"__min$i"), max(col(cols(i))).as(s"__max$i")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*)
    val anyNull = cols.map(col(_).isNull).reduce(_ || _)
    val key = when(anyNull, lit(-1L))
      .otherwise(zkeyN(cols.indices.map(i =>
        scaled(col(cols(i)), col(s"__min$i"), col(s"__max$i"), curveBits))))
    df.crossJoin(broadcast(stats))
      .withColumn("__zkey", key)
      .repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey" +: cols.indices
        .flatMap(i => Seq(s"__min$i", s"__max$i")): _*)
  }
}
