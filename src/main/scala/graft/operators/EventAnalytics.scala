package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event log
  * `(user_id, event_type, ts)` — the classic product-analytics pair,
  * here as engine operators because a training-data platform tracks
  * its OWN ingestion/labeling events the same way.
  *
  * Timestamps are truncated to whole seconds before any comparison:
  * the strict `>` between stage times must not depend on
  * sub-microsecond precision an engine may or may not retain (the
  * parquet column is ns; Spark reads us) — second granularity makes
  * the funnel decision identical everywhere.
  *
  * Scale: each funnel stage is one equi-join + keyed agg on user_id
  * (k shuffles for a k-step funnel, each stage's input strictly
  * shrinking — dropped-off users leave the pipeline at their stage);
  * retention is two keyed aggs and a user-keyed join. Nothing is
  * cross-joined, windowed globally, or collected.
  */
object EventAnalytics {

  private def tsec(ts: org.apache.spark.sql.Column) =
    unix_timestamp(date_trunc("second", ts))

  /** Per-step completion counts for the ordered `steps` funnel:
    * stage i's time is the user's FIRST occurrence of step i strictly
    * after their stage-(i−1) time — and, when `maxGapSecs` is set,
    * within that window of it (the conversion-window form: "purchased
    * within an hour of clicking"). One row per step:
    * `(step, event_type, n_users)`.
    */
  def funnelCounts(
      events: DataFrame,
      steps: Seq[String],
      maxGapSecs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col("user_id"), col("event_type"),
      tsec(col("ts")).as("tsec"))
    val stages = steps.foldLeft(List.empty[DataFrame]) { (acc, step) =>
      val hits = ev.filter(col("event_type") === step)
      val stage = acc match {
        case Nil =>
          hits.groupBy(col("user_id")).agg(min(col("tsec")).as("t"))
        case prev :: _ =>
          val inWindow = maxGapSecs
            .map(g => col("tsec") <= col("t_prev") + g)
            .getOrElse(lit(true))
          prev.select(col("user_id"), col("t").as("t_prev"))
            .join(hits, "user_id")
            .filter(col("tsec") > col("t_prev") && inWindow)
            .groupBy(col("user_id")).agg(min(col("tsec")).as("t"))
      }
      stage :: acc
    }.reverse
    stages.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"),
          col("n_users"))
    }.reduce(_.unionAll(_)).orderBy(col("step"))
  }

  /** Weekly retention triangle: users grouped by their first-activity
    * day (the cohort), counted in each later week they were active.
    * `(cohort_sec, week_offset, n_users)` — cohort day as unix
    * seconds, offset in whole weeks since it.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
      unix_timestamp(date_trunc("day", col("ts"))).as("day_sec")).distinct()
    val cohorts = days.groupBy(col("user_id"))
      .agg(min(col("day_sec")).as("cohort_sec"))
    days.join(cohorts, "user_id")
      .withColumn("week_offset",
        floor((col("day_sec") - col("cohort_sec")) / lit(604800.0)).cast("long"))
      .groupBy(col("cohort_sec"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_sec"), col("week_offset"))
  }

  /** Windowed quantile DRIFT monitor — the data-quality alarm a
    * pipeline runs over an event stream's value distribution: exact
    * per-window median (the L92 histogram interpolation — no group
    * buffering, no sketch error to band away), window-over-window
    * delta via `lag`, and a thresholded alert flag. A shifted sensor,
    * a schema-mangled feed, or an upstream resample shows up as a
    * drift spike long before a mean would move.
    *
    * Scale: the heavy stage is [[Percentiles.groupedExact]]'s
    * window-keyed histogram (map-side partials, two-phase rank at
    * scale / forced); the `lag` runs over the REPORT-sized one-row-
    * per-window frame, where a single-partition window is the right
    * plan, not a smell. p50 is rounded to 6dp BEFORE differencing so
    * drift inherits the cross-engine parity of the rounded medians.
    */
  def quantileDrift(
      events: DataFrame,
      valueCol: String = "value",
      windowLength: String = "1 hour",
      threshold: Double = 0.5): DataFrame = {
    val w = events.select(
      window(col("ts"), windowLength).getField("start").as("win_start"),
      col(valueCol))
    val q = graft.operators.Percentiles
      .groupedExact(w, "win_start", valueCol, Seq(0.5))
      .select(col("win_start"), round(col("p50"), 6).as("p50"), col("n"))
    val byStart = org.apache.spark.sql.expressions.Window
      .orderBy(col("win_start"))
    q.withColumn("drift",
        round(abs(col("p50") - lag(col("p50"), 1).over(byStart)), 6))
      .withColumn("drift_alert",
        coalesce(col("drift") > threshold, lit(false)))
  }
}
