package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join WITHOUT an equi key — the case Spark's
  * planner degrades to a nested-loop join (a range-only condition has
  * no hashable key). Re-expressed via bucketization, tier (a) of the
  * extension policy (compose built-ins before custom plans):
  *
  *  1. each interval explodes into the fixed-width buckets it covers;
  *  2. candidates meet in an EQUI-join on bucket id (+ the exact
  *     overlap predicate as a residual filter);
  *  3. each overlapping pair is emitted EXACTLY ONCE — not once per
  *     shared bucket — by keeping only the match in the bucket that
  *     contains max(lStart, rStart) (both sides provably cover that
  *     bucket, and it is unique per pair), so no distinct pass is
  *     needed.
  *
  * Scale: shuffle keys are bucket ids, so co-located intervals join
  * within their bucket instead of all-pairs; `bucketWidth` trades
  * replication (intervals spanning many buckets) against bucket
  * population — set it near the typical interval length. Inclusive
  * endpoints: intervals [ls, le] and [rs, re] overlap iff
  * ls <= re AND rs <= le.
  *
  * KNOW THE OUTPUT SIZE BEFORE RUNNING THIS ON DENSE INTERVALS: the
  * pair count grows ~quadratically with per-bucket interval density
  * (every interval overlaps ~density × mean-length others), so at
  * 100× the data the bottleneck is the OUTPUT, not the plan — no
  * partitioning strategy shrinks a result that is itself quadratic.
  * When the question is "how many overlaps" rather than "which
  * pairs", use [[countOverlaps]], which aggregates map-side and never
  * shuffles a pair row.
  */
object IntervalJoin {

  /** Inner overlap join of `left` and `right` on
    * [lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅ (inclusive numeric bounds).
    * Malformed intervals (start > end, or a NULL bound) are FILTERED
    * OUT of both sides — overlap is undefined for them, and Spark's
    * `sequence(a, b)` would otherwise generate a DESCENDING bucket
    * list for them and emit arbitrary matches. Column names must be
    * disjoint across the two inputs (rename before calling).
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"column names must be disjoint, clash: $clash")

    // pure integer floor division: (c - pmod(c, w)) is the largest
    // multiple of w that is <= c (pmod is nonnegative), and `div` on an
    // exact multiple is exact. A double round-trip (floor(c/w)) would
    // lose precision past 2^53 and silently mis-bucket extreme bounds.
    def bucketOf(c: org.apache.spark.sql.Column) = {
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, lit(bucketWidth)), lit(bucketWidth))
    }

    val lb = left.filter(col(lStart) <= col(lEnd))
      .withColumn("__lb",
        explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val rb = right.filter(col(rStart) <= col(rEnd))
      .withColumn("__rb",
        explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    lb.join(rb,
        col("__lb") === col("__rb") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          // exactly-once: only the bucket holding the later start emits
          col("__lb") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__lb", "__rb")
  }

  /** Per-left-interval overlap COUNT — the aggregate-pushdown twin of
    * [[overlapJoin]] for the "how many overlaps" question whose pair
    * output is quadratic in interval density. The right side is pruned
    * to its two bound columns BEFORE the bucket join (nothing wider
    * crosses the exchange), and the count partial-aggregates map-side
    * on `leftKey`, so the final shuffle carries one row per (key ×
    * map partition) — pair rows are evaluated in the join's codegen
    * loop but never materialized to an exchange or the driver.
    *
    * Inner semantics: left intervals with zero overlaps are absent
    * from the result (`n_overlapping` is never 0). Needing the
    * zero-count rows or a residual predicate that reads other right
    * columns (e.g. self-exclusion) means the pair-level
    * [[overlapJoin]] is the right tool.
    */
  def countOverlaps(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidth: Long,
      leftKey: String): DataFrame =
    overlapJoin(left, right.select(col(rStart), col(rEnd)),
        lStart, lEnd, rStart, rEnd, bucketWidth)
      .groupBy(col(leftKey))
      .agg(count(lit(1)).as("n_overlapping"))
}
