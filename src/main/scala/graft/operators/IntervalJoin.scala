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

  /** Sentinel for `bucketWidth`: size the buckets from interval-length
    * statistics at plan time (see [[derivedWidth]]) instead of trusting
    * a caller constant — the same stance as
    * [[graft.llm.Similarity.DeriveBits]]. A mis-sized constant at 100×
    * the data either replicates every interval into thousands of
    * buckets (width ≪ lengths) or piles everything into a few (width ≫
    * domain); deriving from the data cannot.
    */
  val DeriveWidth: Long = 0L

  /** The bucket width minimizing expected candidate evaluations: with
    * mean interval lengths Lₐ, Lᵦ and uniform start density, a bucket
    * of width w holds ~(Lₐ+w)/w replicas per left interval and a
    * bucket population ∝ (Lᵦ+w), so candidates ∝ (Lₐ+w)(Lᵦ+w)/w —
    * minimized at w* = √(Lₐ·Lᵦ), the geometric mean of the two sides'
    * mean lengths. Costs ONE aggregate job over both sides (the same
    * "metadata-cheap next to the join it sizes" trade as
    * [[graft.llm.Similarity.derivedBits]]); callers that know their
    * data pass an explicit width and skip it. Medians (approx) rather
    * than means so one pathological giant interval cannot blow up the
    * width for everyone.
    */
  def derivedWidth(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String): Long = {
    val lens = left
      .filter(col(lStart) <= col(lEnd))
      .select((col(lEnd).cast("long") - col(lStart).cast("long") + 1L)
        .cast("double").as("len"), lit(1).as("side"))
      .unionAll(right
        .filter(col(rStart) <= col(rEnd))
        .select((col(rEnd).cast("long") - col(rStart).cast("long") + 1L)
          .cast("double").as("len"), lit(2).as("side")))
    val meds = lens.groupBy(col("side"))
      .agg(expr("percentile_approx(len, 0.5)").as("med"))
      .collect().map(r => r.getDouble(1)).filter(_ > 0)
    if (meds.isEmpty) 64L
    else math.max(1L, math.round(math.sqrt(meds.product match {
      case p if meds.length == 2 => p
      case p => p * p // one empty side: fall back to the other's median²
    })))
  }

  /** Inner overlap join of `left` and `right` on
    * [lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅ (inclusive numeric bounds).
    * Malformed intervals (start > end, or a NULL bound) are FILTERED
    * OUT of both sides — overlap is undefined for them, and Spark's
    * `sequence(a, b)` would otherwise generate a DESCENDING bucket
    * list for them and emit arbitrary matches. Column names must be
    * disjoint across the two inputs (rename before calling).
    * `bucketWidth = DeriveWidth` (the default) sizes buckets from
    * interval-length medians via [[derivedWidth]].
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidth: Long = DeriveWidth): DataFrame = {
    require(bucketWidth >= 0, "bucketWidth must be positive (0 = derive)")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"column names must be disjoint, clash: $clash")
    val width =
      if (bucketWidth == DeriveWidth)
        derivedWidth(left, right, lStart, lEnd, rStart, rEnd)
      else bucketWidth

    // pure integer floor division: (c - pmod(c, w)) is the largest
    // multiple of w that is <= c (pmod is nonnegative), and `div` on an
    // exact multiple is exact. A double round-trip (floor(c/w)) would
    // lose precision past 2^53 and silently mis-bucket extreme bounds.
    def bucketOf(c: org.apache.spark.sql.Column) = {
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, lit(width)), lit(width))
    }

    val lb = left.filter(col(lStart) <= col(lEnd))
      .withColumn("__lb",
        explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val rb = right.filter(col(rStart) <= col(rEnd))
      .withColumn("__rb",
        explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    // The residual predicates run per CANDIDATE pair inside the join
    // (the interpreted-eval position — see the q104 levenshtein fence in
    // TextDedup): keep them pure compare/multiply arithmetic. In
    // particular the exactly-once check is the RANGE form
    // `__lb*w <= max(ls,rs) < __lb*w + w` (bucket id is already a
    // column), not a div/pmod re-derivation of bucketOf per pair.
    val g = greatest(col(lStart).cast("long"), col(rStart).cast("long"))
    val bStart = col("__lb") * lit(width)
    lb.join(rb,
        col("__lb") === col("__rb") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          // exactly-once: only the bucket holding the later start emits
          bStart <= g && g < bStart + lit(width))
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
      bucketWidth: Long = DeriveWidth,
      leftKey: String): DataFrame =
    overlapJoin(left, right.select(col(rStart), col(rEnd)),
        lStart, lEnd, rStart, rEnd, bucketWidth)
      .groupBy(col(leftKey))
      .agg(count(lit(1)).as("n_overlapping"))
}
