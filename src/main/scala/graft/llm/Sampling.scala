package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded, deterministic corpus sampling — the curation op behind
  * train/validation splits, ablation subsets, and reproducible
  * experiment slices. Membership is a pure function of
  * `(seed, key)` via the engine-portable [[TextFns.hash60]] (md5), so:
  *
  *  - the same row lands in the same split on EVERY engine, run,
  *    partitioning, and cluster size (unlike `DataFrame.sample`, whose
  *    output depends on partition iteration order);
  *  - splits are reproducible from the seed alone — no persisted
  *    membership table to join at 100 TB, no shuffle at all: sampling
  *    is a codegen'd filter that fuses into the scan;
  *  - disjoint fractions of the same seed partition the corpus (val =
  *    bucket < t, train = rest), so train/val can never overlap.
  *
  * Granularity is 1e-6 (buckets are `hash60 mod 10^6`): fractions
  * finer than a millionth round to the nearest bucket.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Deterministic bucket in [0, 10^6) for a row key under a seed:
    * `hash60(seed || '|' || key) mod 10^6`. Exactly mirrorable in SQL:
    * `CAST('0x' || substr(md5(seed || '|' || key), 1, 15) AS BIGINT) %
    * 1000000`.
    */
  def bucketOf(seed: String, key: Column): Column =
    TextFns.hash60(concat_ws("|", lit(seed), key.cast("string"))) % Buckets

  private def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    math.round(fraction * Buckets)
  }

  /** The rows whose seeded bucket falls under `fraction` — a
    * reproducible ~fraction subset keyed on `keyCol`.
    */
  def sampleCorpus(
      docs: DataFrame,
      fraction: Double,
      seed: String,
      keyCol: String = "doc_id"): DataFrame =
    docs.filter(bucketOf(seed, col(keyCol)) < threshold(fraction))

  /** Every row labeled `'val'` (seeded bucket under `valFraction`) or
    * `'train'` — a disjoint, exhaustive, rerun-stable split.
    */
  def trainValSplit(
      docs: DataFrame,
      valFraction: Double,
      seed: String,
      keyCol: String = "doc_id"): DataFrame =
    docs.withColumn("split",
      when(bucketOf(seed, col(keyCol)) < threshold(valFraction), lit("val"))
        .otherwise(lit("train")))

  /** Stratified sample: an independent seeded fraction per value of
    * `strataCol` (e.g. keep 100% of rare languages, 1% of English).
    * Strata absent from `fractions` fall back to `defaultFraction`.
    * Still one shuffle-free codegen'd filter — the per-stratum
    * threshold is a CASE over the strata column.
    */
  def stratifiedSample(
      docs: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      seed: String,
      defaultFraction: Double = 0.0,
      keyCol: String = "doc_id"): DataFrame = {
    val thresh = fractions.foldLeft(lit(threshold(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(threshold(f))).otherwise(acc)
    }
    docs.filter(bucketOf(seed, col(keyCol)) < thresh)
  }
}
