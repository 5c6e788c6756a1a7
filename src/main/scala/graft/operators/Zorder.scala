package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional file
  * pruning for the write side. A table range-sorted on ONE column
  * prunes scans filtered on that column and nothing else; a 100 TB
  * corpus queried by `(customer, date)` or `(source, quality)` wants
  * BOTH predicates to hit parquet min/max stats. Interleaving the
  * two dimensions' bits gives a single sort key whose ranges are
  * axis-aligned squares: after `zorderBy`, every file's min/max
  * footprint is tight in BOTH dimensions, so either predicate (or
  * both) skips files — the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, here as a plain repartition+sort any
  * parquet write can use.
  *
  * [[zkey]] is pure codegen'd column arithmetic (the classic 5-step
  * mask spread — shift/or/and on longs, no UDF, no allocation), so
  * the key costs ~10 integer ops per row inside whole-stage codegen
  * and is exactly mirrorable in SQL (`<<`, `|`, `&` exist in every
  * engine) — the q133 oracle pins the bit layout.
  *
  * Scale shape: [[zorderBy]] is ONE stats aggregate (min/max of both
  * columns — a broadcast-sized row) + one range repartition on the
  * key + in-partition sort: exactly the cost of a global sort on one
  * column, which is what it replaces.
  */
object Zorder {

  /** Interleave the low 31 bits of two nonnegative longs: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1 — the 2-D Morton
    * code, < 2⁶³ (sign-safe) by construction. Inputs are clamped to
    * [0, 2³¹−1]; map real domains into that range first
    * ([[scaled]] or any affine bucketing) — clamping is a floor/cap,
    * not wraparound, so out-of-domain values still sort to the curve's
    * edges. NULL in either column propagates NULL (callers coalesce
    * to a sentinel bucket first; [[zorderBy]] does).
    */
  def zkey(x: Column, y: Column): Column =
    spread(clamp31(x)).bitwiseOR(shiftleft(spread(clamp31(y)), 1))

  private def clamp31(c: Column): Column =
    greatest(lit(0L), least(c.cast("long"), lit((1L << 31) - 1)))

  /** The standard mask cascade: spreads the low 32 bits of a long to
    * the even bit positions 0,2,…,62 in 5 shift/or/and steps.
    */
  private def spread(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
    s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
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
    * `(c1, c2)`: min/max stats (one tiny agg, broadcast back), scale
    * both columns onto the curve, range-repartition + in-partition
    * sort by the interleaved key. Write the result with any sink —
    * each output file's (c1, c2) min/max footprint is then a compact
    * curve segment. NULLs sort first via a −1 sentinel bucket (below
    * the curve), matching NULLS FIRST range-sort semantics.
    */
  def zorderBy(df: DataFrame, c1: String, c2: String,
      numPartitions: Int): DataFrame = {
    val stats = df.agg(
      min(col(c1)).as("__min1"), max(col(c1)).as("__max1"),
      min(col(c2)).as("__min2"), max(col(c2)).as("__max2"))
    val key = when(col(c1).isNull || col(c2).isNull, lit(-1L))
      .otherwise(zkey(
        scaled(col(c1), col("__min1"), col("__max1")),
        scaled(col(c2), col("__min2"), col("__max2"))))
    df.crossJoin(broadcast(stats))
      .withColumn("__zkey", key)
      .repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey", "__min1", "__max1", "__min2", "__max2")
  }
}
