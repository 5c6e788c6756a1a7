package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
      keyCol: String = "doc_id"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.filter(bucketOf(seed, col(keyCol)) < threshold(fraction))
  }

  /** Every row labeled `'val'` (seeded bucket under `valFraction`) or
    * `'train'` — a disjoint, exhaustive, rerun-stable split.
    */
  def trainValSplit(
      docs: DataFrame,
      valFraction: Double,
      seed: String,
      keyCol: String = "doc_id"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.withColumn("split",
      when(bucketOf(seed, col(keyCol)) < threshold(valFraction), lit("val"))
        .otherwise(lit("train")))
  }

  /** Temperature-weighted source mixing — the standard pretraining
    * data-mixture op: resample so the effective mixture over
    * `sourceCol` is proportional to `n_s^alpha` instead of `n_s`
    * (alpha < 1 flattens the mixture toward uniform; alpha = 1 is a
    * no-op). The per-source keep fraction is
    * `f_s = (n_min / n_s)^(1 - alpha)` — the smallest source is kept
    * whole and larger sources are downsampled, so no source is ever
    * upsampled (no row duplication, output is a pure subset).
    *
    * Row membership reuses the seeded md5 bucket of [[bucketOf]], so
    * the mix is deterministic and engine-portable. Shape: one tiny
    * per-source count aggregation (map-side partial, |sources| rows),
    * broadcast back onto the corpus, then a codegen'd filter — the
    * corpus is scanned twice but never shuffled. At warehouse scale
    * the counts frame can be replaced by metastore statistics.
    *
    * Parity note: for `alpha = 0.5` the fraction is computed as
    * `sqrt(n_min / n)` — a chain of correctly-rounded IEEE ops
    * (divide, sqrt, multiply, floor), bit-identical across engines.
    * Other alphas go through `pow`, which libm implementations may
    * round differently in the last ulp; fine in production, but pin
    * alpha = 0.5 when exact cross-engine parity matters.
    *
    * Rows with a NULL `sourceCol` are dropped (the threshold join-back
    * is null-rejecting, standard SQL equi-join semantics) — clean the
    * source column first if nulls must survive.
    */
  def temperatureMix(
      docs: DataFrame,
      sourceCol: String,
      alpha: Double,
      seed: String,
      keyCol: String = "doc_id"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val ratio = col("__n_min").cast("double") / col("__n").cast("double")
    val frac = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    val thresholds = counts.crossJoin(broadcast(nMin))
      .select(col(sourceCol), floor(frac * lit(Buckets.toDouble)).as("__thresh"))
    docs.join(broadcast(thresholds), sourceCol)
      .filter(bucketOf(seed, col(keyCol)) < col("__thresh"))
      .drop("__thresh")
  }

  /** Greedy token-budget selection: keep documents in
    * `(qualityCol DESC, keyCol ASC)` order while the running sum of
    * `tokenCol` stays within `budget` — "fill a 10B-token training
    * budget with the best documents first". Exactly equivalent to a
    * global ordered cumulative sum + filter, but computed as a
    * two-phase prefix sum (the [[Packing]] pattern): per-quality-value
    * token totals (a tiny aggregate, one row per distinct quality)
    * are cumulated in one window over that tiny frame and broadcast
    * back; each row then adds only its within-quality prefix, which
    * rides a window PARTITIONED by the quality value. No global sort
    * of the corpus, no unpartitioned window over row-level data.
    *
    * `qualityCol` must be coarse (an integer score, a bucketed
    * double): the phase-1 frame has one row per distinct value, so a
    * continuous score should be bucketized before calling (the
    * selection boundary then lands inside one bucket, which is the
    * usual curation semantics anyway). Rows with a NULL quality are
    * dropped by the offset join-back; NULL token counts cost 0 toward
    * the budget (SQL `sum` skips nulls) — clean both columns upstream
    * if those defaults don't fit.
    */
  def budgetSelect(
      docs: DataFrame,
      tokenCol: String,
      qualityCol: String,
      budget: Long,
      keyCol: String = "doc_id"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // NULL token counts cost 0 (coalesced INSIDE both sums) — without
    // this, a NULL running prefix would turn __cum NULL and silently
    // DROP the row instead of keeping it free, contradicting the
    // contract above
    val cost = coalesce(col(tokenCol), lit(0L))
    // the shared [[graft.operators.PrefixSum]] kernel (r14 VERDICT #1):
    // bucket = the coarse quality value itself, cascaded DESC so the
    // only unpartitioned window runs over the distinct-quality frame;
    // rows with a NULL quality drop at the kernel's bucket join-back
    // (the contract above)
    graft.operators.PrefixSum
      .inclusive(docs, Seq.empty, qualityCol, Seq(col(keyCol)), cost,
        "__cum", bucketAsc = false)
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Per-group top-fraction selection — relative quality calibration:
    * keep the best `fraction` of rows WITHIN each group (e.g. the top
    * 30% by quality per language), so a single global threshold never
    * starves low-resource groups. Exact rank-based semantics — keep
    * rank ≤ ceil(fraction × group size) under the total order
    * `(orderCol DESC, keyCol ASC)` — which both engines compute
    * identically (no percentile-function interpolation to mismatch).
    *
    * Scale: NO grouped sort of the corpus. The r6 form
    * (`row_number` over `Window.partitionBy(group)`) sent each group
    * through ONE partition — with an 80%-English corpus that is a
    * single-task sort of most of the corpus. This form is the
    * [[graft.llm.TextAnalysis.sourceQualityRank]] histogram technique
    * applied to selection: per-(group, value) counts, a cumulative
    * "strictly better" prefix over each group's VALUE DOMAIN (small by
    * construction), broadcast back on the composite key. A row's rank
    * is then `better + (its position among ties)`; only the one
    * BOUNDARY value per group (where `better < k < better + ties`)
    * needs a tie-break at all, so the row_number window runs over the
    * boundary-only frame, partitioned by the composite (group, value)
    * key — never by the raw group over the full corpus.
    *
    * `orderCol` must be coarse (an integer score, a bucketed double):
    * the histogram has one row per distinct (group, value) — the same
    * contract as [[budgetSelect]]'s qualityCol. If every row of a
    * group ties at one value the boundary frame degenerates to that
    * group (bucketize a finer score before calling).
    */
  def topFractionPerGroup(
      docs: DataFrame,
      groupCol: String,
      orderCol: String,
      fraction: Double,
      keyCol: String = "doc_id"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    // per-(group, value) histogram + rows strictly better (DESC order),
    // cumulated over the value domain — the only group-partitioned
    // window runs over this aggregated frame
    val byValueDesc = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = docs.groupBy(col(groupCol), col(orderCol))
      .agg(count(lit(1)).as("__cnt"))
      .select(col(groupCol), col(orderCol), col("__cnt"),
        coalesce(sum(col("__cnt")).over(byValueDesc), lit(0L)).as("__better"))
    val limits = docs.groupBy(col(groupCol))
      .agg(ceil(count(lit(1)) * lit(fraction)).cast("long").as("__k"))
    // Null-safe joins: the histogram HAS a row for a NULL orderCol
    // (groupBy keeps null keys, and the DESC window ranks it last,
    // matching the r6 row_number form's NULLS LAST) — an equi-join
    // would silently drop those rows while still counting them in __k.
    val histR = hist
      .withColumnRenamed(groupCol, "__h_g").withColumnRenamed(orderCol, "__h_v")
    val limitsR = limits.withColumnRenamed(groupCol, "__l_g")
    val joined = docs
      .join(broadcast(histR),
        col(groupCol) <=> col("__h_g") && col(orderCol) <=> col("__h_v"))
      .join(broadcast(limitsR), col(groupCol) <=> col("__l_g"))
      .drop("__h_g", "__h_v", "__l_g")
    // whole-value keeps: every tie at this value fits under k
    val keepAll = joined.filter(col("__better") + col("__cnt") <= col("__k"))
    // boundary value (at most one per group): keep the (k - better)
    // smallest keys among its ties — the tie-break window is composite-
    // keyed AND runs over only these rows
    val wTie = Window.partitionBy(col(groupCol), col(orderCol))
      .orderBy(col(keyCol))
    val keepBoundary = joined
      .filter(col("__better") < col("__k") &&
        col("__better") + col("__cnt") > col("__k"))
      .withColumn("__tie", row_number().over(wTie))
      .filter(col("__tie") <= col("__k") - col("__better"))
      .drop("__tie")
    keepAll.unionByName(keepBoundary)
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Exactly-k-per-group deterministic sample — the fixed-BUDGET
    * counterpart of [[stratifiedSample]]'s fixed-fraction rule: "5
    * eval docs per language", "1000 audit rows per source", where the
    * quota is a count, not a rate, so a group's keep probability must
    * adapt to its (unknown) size. Selection = the k LARGEST hash
    * values under a seeded hash order (the direction the q132 oracle
    * pins: ORDER BY hash DESC): membership is still a pure
    * function of (seed, key) — rerun-stable, engine-portable,
    * independent of partitioning — but unlike a fraction filter it
    * needs a per-group rank, which here rides the bounded
    * [[graft.functions.TopKAgg]] heap: k rows per (group × map
    * partition) through the one shuffle, no grouped sort, no
    * row_number window over the corpus (the L56 skew lesson — an
    * 80%-English corpus would funnel through one task).
    *
    * The hash order is `hash60 >> 8`: [[graft.functions.TopKAgg]]
    * scores are doubles, and 52 bits is exactly the width a double
    * represents losslessly — a raw 60-bit score would round and
    * diverge from SQL's BIGINT ordering. Ties (2⁻⁵² per pair) break
    * by key ASC identically in both engines. Output: one row per kept
    * doc, `(groupCol, rnk, keyCol)` with rnk 1..k in hash order;
    * groups smaller than k keep everything. NULL keys are ignored
    * (never sampled); a NULL group is its own quota group.
    */
  def sampleKPerGroup(
      docs: DataFrame,
      groupCol: String,
      k: Int,
      seed: String,
      keyCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val score = shiftright(TextFns.hash60(
      concat_ws("|", lit(seed), col(keyCol).cast("string"))), 8)
    docs
      .select(col(groupCol), col(keyCol), score.cast("double").as("__h"))
      .groupBy(col(groupCol))
      .agg(call_function(graft.functions.GraftFunctions.TopKName,
        col("__h"), col(keyCol), lit(k)).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as(keyCol))
  }

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
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val thresh = fractions.foldLeft(lit(threshold(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(threshold(f))).otherwise(acc)
    }
    docs.filter(bucketOf(seed, col(keyCol)) < thresh)
  }

  /** Deterministic global training order — the corpus SHUFFLE every
    * epoch needs: each doc ranks by its seeded md5 hash (ties by key),
    * yielding a uniform permutation that is a pure function of
    * `(seed, key)` — rerun-stable, engine-portable, and re-derivable
    * for any doc without materializing the order (epoch 2 is just a
    * new seed). Output: `(keyCol, rnk)`, rnk 1..N in training order.
    *
    * The scale point is HOW the rank is assigned: `row_number() OVER
    * (ORDER BY h)` is the classic single-partition funnel (one task
    * holds the corpus). This form rides the shared two-phase
    * [[graft.operators.PrefixSum]] kernel — the hash's top bits are
    * the order-consistent range bucket (md5 is uniform, so buckets
    * are balanced BY CONSTRUCTION, no stats pass needed), per-bucket
    * counts make the offsets, and within-bucket ranks run
    * embarrassingly parallel. Identical output to the window form,
    * distributed execution — the q143 oracle IS the single-window
    * statement.
    */
  def trainingOrder(
      docs: DataFrame,
      seed: String,
      nBuckets: Int = 1024,
      keyCol: String = "doc_id"): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0 &&
      nBuckets <= (1 << 20), "nBuckets must be a power of two <= 2^20")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val bucketWidth = (1L << 60) / nBuckets
    val h = TextFns.hash60(concat_ws("|", lit(seed),
      col(keyCol).cast("string")))
    val keyed = docs
      .select(col(keyCol))
      .withColumn("__h", h)
      .withColumn("__b", (col("__h") / lit(bucketWidth)).cast("long"))
    graft.operators.PrefixSum
      .inclusive(keyed, Nil, "__b",
        Seq(col("__h"), col(keyCol)), lit(1L), out = "rnk")
      .select(col(keyCol), col("rnk"))
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM'07) — a
    * WEIGHTED k-sample with per-item unbiased subset-sum estimators:
    * each item draws `u ∈ (0, 1]` from the seeded md5 hash, gets
    * priority `q = w / u`, the `k` highest priorities are kept, and
    * every kept item reports `w_est = max(w, τ)` with τ the
    * (k+1)-st priority (0 when the corpus has ≤ k items — every item
    * kept, estimates exact). `E[Σ_{kept ∩ S} w_est] = Σ_S w` for ANY
    * item subset S — the one-pass weighted-sampling scheme whose
    * sample supports unbiased "how many tokens does slice X hold"
    * answers at any later time, which a plain weighted-probability
    * sample cannot.
    *
    * Determinism — the samplers' shared contract, extended to
    * weights: `u = (hash60(seed|key) + 1) / 2^60` and `q = w / u` are
    * two exactly-rounded IEEE divisions in fixed order (the
    * long→double cast is exactly-rounded too), so priorities, the
    * top-k cut, τ, and the estimates are bit-identical across
    * engines, reruns, and partitionings — q141 hash-compares with no
    * band. This exactness is WHY the priority form was chosen over
    * the classic exponential/a-res keys (`u^{1/w}` needs `pow`,
    * whose last bit is libm-specific).
    *
    * Scale shape: one corpus pass through the bounded
    * [[graft.functions.TopKAgg]] heap at k+1 (k+1 rows per map
    * partition through the one global merge — no corpus sort), then
    * a k-row broadcast joins the weights back. Non-positive and NULL
    * weights are never sampled (the scheme is defined for w > 0).
    * Output: `(rnk, keyCol, wt, q, w_est)`, rnk 1..k by (q DESC,
    * key ASC).
    */
  def prioritySample(
      docs: DataFrame,
      weightCol: String,
      k: Int,
      seed: String,
      keyCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val u = (TextFns.hash60(concat_ws("|", lit(seed),
      col(keyCol).cast("string"))) + lit(1L)).cast("double") /
      lit(1152921504606846976.0) // 2^60 — u in (0, 1], never 0
    val weighted = docs
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(keyCol),
        (col(weightCol).cast("double") / u).as("__q"))
    val top = weighted
      .agg(call_function(graft.functions.GraftFunctions.TopKName,
        col("__q"), col(keyCol), lit(k + 1)).as("__top"))
      .select(col("__top"),
        when(size(col("__top")) > k,
          element_at(col("__top"), k + 1).getField("score"))
          .otherwise(lit(0.0)).as("__tau"))
    val kept = top
      .select(col("__tau"), posexplode(col("__top")))
      .filter(col("pos") < k)
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as(keyCol), col("col.score").as("q"),
        col("__tau"))
    docs.select(col(keyCol), col(weightCol).cast("double").as("wt"))
      .join(broadcast(kept), Seq(keyCol))
      .select(col("rnk"), col(keyCol), col("wt"), col("q"),
        greatest(col("wt"), col("__tau")).as("w_est"))
  }

  /** Per-GROUP priority sampling — [[prioritySample]]'s quota form:
    * an independent weighted k-sample with subset-sum estimators
    * WITHIN each value of `groupCol` ("k docs per language, weighted
    * by length, still answering how many tokens each language slice
    * holds"). Same determinism contract (two fixed-order IEEE
    * divisions per row — cut, τ, and estimates hash-compare), same
    * scale shape: the k+1 heap rides the grouped
    * [[graft.functions.TopKAgg]] — k+1 rows per (group × map
    * partition) through the one shuffle, never a grouped row_number
    * over the corpus (the L56 skew funnel). Per-group τ is the
    * group's own (k+1)-st priority (0 where the group has ≤ k
    * sampleable rows). Output: `(groupCol, rnk, keyCol, wt, q,
    * w_est)`, rnk 1..k per group.
    */
  def prioritySamplePerGroup(
      docs: DataFrame,
      groupCol: String,
      weightCol: String,
      k: Int,
      seed: String,
      keyCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val u = (TextFns.hash60(concat_ws("|", lit(seed),
      col(keyCol).cast("string"))) + lit(1L)).cast("double") /
      lit(1152921504606846976.0) // 2^60 — u in (0, 1], never 0
    val top = docs
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol), col(keyCol),
        (col(weightCol).cast("double") / u).as("__q"))
      .groupBy(col(groupCol))
      .agg(call_function(graft.functions.GraftFunctions.TopKName,
        col("__q"), col(keyCol), lit(k + 1)).as("__top"))
      .select(col(groupCol), col("__top"),
        when(size(col("__top")) > k,
          element_at(col("__top"), k + 1).getField("score"))
          .otherwise(lit(0.0)).as("__tau"))
    val kept = top
      .select(col(groupCol), col("__tau"), posexplode(col("__top")))
      .filter(col("pos") < k)
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as(keyCol), col("col.score").as("q"),
        col("__tau"))
    // join back on (group, key): a key only unique WITHIN its group
    // must not cross-match other groups' rows. No forced broadcast —
    // kept is k+1 rows PER GROUP, and group cardinality is the
    // caller's domain (per-language: tiny; per-domain: millions), so
    // the planner/AQE picks the strategy from the actual size.
    docs.select(col(groupCol), col(keyCol),
        col(weightCol).cast("double").as("wt"))
      .join(kept, Seq(groupCol, keyCol))
      .select(col(groupCol), col("rnk"), col(keyCol), col("wt"), col("q"),
        greatest(col("wt"), col("__tau")).as("w_est"))
  }

  /** Deterministic training-shard assignment: every doc hash-assigned
    * to one of `nShards` shards by its seeded md5 bucket — the
    * write-side layout op for a training corpus (shard =
    * `repartition(nShards, col("shard"))` + partitioned write). Same
    * portability contract as the samplers: assignment is a pure
    * function of (seed, key), stable across engines, runs, and
    * cluster sizes — a resumed or re-run export produces byte-stable
    * shard membership. Emits per-shard balance stats (the skew audit:
    * md5 buckets spread uniformly, so shard sizes concentrate tightly
    * around n/nShards).
    *
    * Shard assignment is `bucket % nShards` over the 1,000,000-value
    * seeded-bucket space: when nShards does not divide 1e6, the low
    * (1e6 mod nShards) shards each see one extra bucket — a relative
    * size bias of ~nShards/1e6 (≈1e-5 at nShards=8), far below the
    * natural binomial spread of real shard sizes. Callers needing
    * exactly-uniform assignment for very large nShards should shard on
    * a wider hash, not this audit helper.
    */
  def shardStats(
      docs: DataFrame,
      nShards: Int,
      seed: String,
      keyCol: String = "doc_id"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs
      .withColumn("shard", (bucketOf(seed, col(keyCol)) % nShards).cast("int"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextFns.tokens(col("text"))).cast("long")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
  }
}
