package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the "perplexity filter" of
  * CCNet-style curation (Wenzek et al. 2020, "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data") re-expressed
  * LOG-FREE: a document is scored by the fraction of its word
  * bigrams whose add-one-smoothed LM probability falls below a
  * rarity threshold, instead of by mean negative log-probability.
  * The two scores order documents near-identically (both count mass
  * in the improbable-transition tail; a doc is junk when MANY of its
  * transitions are ones the reference LM has never licensed), but the
  * rare-fraction form needs only integer comparisons and ONE IEEE
  * division per doc — `log` is deliberately absent because libm `log`
  * is not correctly-rounded and differs between the JVM and other
  * engines (the same reason q127 ships TV/Hellinger and not KL), so
  * this form hash-compares exactly against an independent SQL oracle
  * while a summed-log perplexity never could.
  *
  * Model: trained on a REFERENCE slice (CCNet uses Wikipedia; here
  * any DataFrame with a `text` column). With train bigram counts
  * `c_ab`, train unigram counts `c_a`, and vocabulary size `V`
  * (distinct train tokens), the add-one estimate is
  * `p(b|a) = (c_ab + 1) / (c_a + V)`, and a bigram is RARE iff
  * `p < 1/rarity`, i.e. iff `rarity·(c_ab + 1) < c_a + V` — exact
  * 64-bit integer arithmetic on both engines (c_ab ≤ c_a ≤ train
  * token count and rarity is caller-bounded, so the product stays
  * far from overflow). Out-of-vocabulary context (`c_a = 0`) reduces
  * to `rarity·(c_ab+1) < V` — unseen transitions in a large
  * vocabulary count as rare, the conservative direction for a
  * quality gate. An EMPTY reference vocabulary (V = 0) makes the
  * rare predicate unsatisfiable — the gate would silently keep
  * everything — so it raises at runtime instead (r16 ADVICE).
  *
  * Keys are HASHES, not strings (r16 VERDICT: the string form's
  * corpus shuffle carried raw `(w1,w2)` pairs — 6.8× the oracle at
  * sf1 on shuffle volume alone): each token md5-hashes ONCE into the
  * shared 31-bit space ([[TextFns.tokenHashes]], the dedup-family
  * front end), and a bigram's key packs its two token hashes into one
  * 62-bit long (`h1·2³¹ + h2` — the [[TextFns.fingerprintFromHashes]]
  * packing, which also recovers the unigram key as `bg >> 31`, so the
  * context join needs no second column). Every shuffle after the scan
  * carries 8-byte longs; strings never leave their scan task. Key
  * collisions require token-level 31-bit collisions and merely MERGE
  * the colliding counts — and the SQL oracle mirrors the identical
  * hashes, so the compare stays exact regardless.
  *
  * Scale (100 TB corpus): the model is two count tables bounded by
  * the TRAIN slice's bigram/unigram vocabulary (corpus-sublinear —
  * Heaps' law, and the train slice is curated/small by construction),
  * both built with map-side partial aggregation over hashed keys. The
  * corpus side pre-aggregates to per-doc DISTINCT bigram keys with
  * multiplicity (`n`), so the model join touches one row per distinct
  * (doc, bigram), not one per token; both joins are equi-keyed on
  * longs (AQE broadcasts the model tables when they fit, shuffles
  * when they don't) and the vocabulary scalar rides a one-row
  * broadcast cross-join. Nothing in the plan is quadratic and nothing
  * collects.
  */
object LangModel {

  /** Above this many model rows (unigram + bigram counters) the model
    * joins stay shuffle-keyed instead of broadcasting: 2M rows ≈
    * ~60 MB of unsafe-row payload per executor — comfortably inside
    * broadcast budgets, far above any curated reference slice's
    * vocabulary, and a hard stop before a Wikipedia-scale model would
    * try to ship per executor.
    */
  private val BroadcastModelMaxRows = 2000000

  /** Per-document rare-transition score against a bigram LM trained
    * on `refDocs`. Returns one row per `docs` row:
    * `(doc_id, n_bigrams, n_rare, rare_frac, keep)` with
    * `rare_frac = n_rare / n_bigrams` (0.0 for docs with fewer than
    * two tokens — no transition evidence, kept) and
    * `keep = rare_frac <= maxRareFrac`.
    *
    * @param rarity a bigram is rare iff its smoothed probability is
    *               below `1/rarity`; 256 flags transitions at least
    *               ~an order of magnitude below a uniform-ish floor
    *               for the test vocabularies while staying overflow-
    *               safe for any train count that fits a long / 2^20
    */
  def rareTransitionScore(
      docs: DataFrame,
      refDocs: DataFrame,
      rarity: Long = 256,
      maxRareFrac: Double = 0.5): DataFrame = {
    require(rarity > 0 && rarity <= (1L << 20),
      "rarity must be in (0, 2^20] (keeps rarity*(c_ab+1) exact)")
    require(maxRareFrac >= 0.0 && maxRareFrac <= 1.0,
      "maxRareFrac must be in [0, 1]")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)

    // ONE reference scan builds BOTH model tables (r17: separate
    // trainUni / trainBg / vocab aggregations each re-ran the train
    // slice's tokenize+md5 pipeline — three corpus-scale scans for a
    // vocab-bounded model, profiled as ~3/4 of the whole query at
    // sf1). Unigram and bigram keys ride one explode as (t, k) pairs
    // into a single keyed agg; the model table is train-vocabulary-
    // bounded (Heaps' law), so its localCheckpoint is small by
    // construction and the two model joins plus the vocabulary scalar
    // read counters, never text. Pinned blocks are released by the
    // harness broom between queries (the minhashIndex convention).
    // NO Filter may touch the token-hash array (the q67 lesson, re-hit
    // here in r17: a pushed `size(hs) >= k` predicate re-inlines the
    // whole tokenize+md5 pipeline below the projection, doubling every
    // scan) — short docs are excluded by in-PROJECTION when-guards,
    // and `explode` of the resulting empty array emits nothing.
    val model = refDocs
      .select(TextFns.tokenHashes(col("text")).as("hs"))
      .select(explode(concat(
        transform(col("hs"), h => struct(lit(0).as("t"), h.as("k"))),
        transform(bigramKeys(col("hs")),
          k => struct(lit(1).as("t"), k.as("k"))))).as("x"))
      .groupBy(col("x.t").as("t"), col("x.k").as("k"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val trainUni = model.filter(col("t") === 0)
      .select(col("k").as("uh"), col("c").as("c_a"))
    val trainBg = model.filter(col("t") === 1)
      .select(col("k").as("bg"), col("c").as("c_ab"))
    // V as a one-row frame riding a broadcast cross-join (a literal
    // would force a separate eager job). V = 0 (empty/token-free
    // reference) raises instead of silently disabling the gate (r16
    // ADVICE): with c_a = 0 everywhere the rare predicate
    // rarity·(c_ab+1) < c_a+V can never hold, so every doc would
    // score 0 rare bigrams and keep=true.
    val vocab = trainUni.agg(count(lit(1)).as("__v"))
      .select(when(col("__v") === 0, raise_error(lit(
        "rareTransitionScore: reference corpus has an empty vocabulary" +
          " (no tokens) — the rarity gate would pass every document")))
        .otherwise(col("__v")).as("v"))

    val rare = (lit(rarity) * (coalesce(col("c_ab"), lit(0L)) + 1L)) <
      (coalesce(col("c_a"), lit(0L)) + col("v"))
    // Dual regime on a bounded probe of the (already materialized)
    // model checkpoint (r17; the keepFilter/J1 convention). The common
    // case — a curated reference slice, vocab-bounded model — BROADCASTS
    // both model tables explicitly: the bench/verify harness runs AQE
    // off, where the checkpoint scan's unknown stats otherwise demote
    // both model joins to sort-merge and the corpus bigram stream pays
    // TWO full shuffles + sorts for a lookup against a few thousand
    // counters. With the hints, the stream never shuffles at all: both
    // lookups are map-side, and the per-doc aggregation partial-
    // combines to ≤ one row per doc before its only exchange — so the
    // distinct-bigram pre-aggregation buys nothing and is skipped
    // (per-occurrence counting is value-identical: the rare test is a
    // pure function of the key). A model that overflows the probe —
    // the Wikipedia-scale reference, or forceDistributed — keeps the
    // shuffle-join form, fronted by the distinct pre-agg so the model
    // join pays one row per DISTINCT (doc, bigram).
    val modelBroadcasts = !graft.Regimes.forceDistributed &&
      model.limit(BroadcastModelMaxRows + 1).count() <= BroadcastModelMaxRows.toLong
    val perDoc =
      if (modelBroadcasts)
        hashedBigrams(docs)
          .withColumn("uh", shiftright(col("bg"), 31))
          .join(broadcast(trainBg), Seq("bg"), "left")
          .join(broadcast(trainUni), Seq("uh"), "left")
          .crossJoin(broadcast(vocab))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when(rare, 1L).otherwise(0L)).as("n_rare"))
      else
        hashedBigrams(docs)
          .groupBy(col("doc_id"), col("bg"))
          .agg(count(lit(1)).as("n"))
          .withColumn("uh", shiftright(col("bg"), 31))
          .join(trainBg, Seq("bg"), "left")
          .join(trainUni, Seq("uh"), "left")
          .crossJoin(broadcast(vocab))
          .groupBy(col("doc_id"))
          .agg(sum(col("n")).as("n_bigrams"),
            sum(when(rare, col("n")).otherwise(0L)).as("n_rare"))

    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(col("n_rare").cast("double") / col("n_bigrams"))
          .as("rare_frac"),
        when(col("n_bigrams").isNull, lit(true))
          .otherwise(col("n_rare").cast("double") / col("n_bigrams")
            <= lit(maxRareFrac))
          .as("keep"))
  }

  /** Adjacent word-bigram KEY stream `(doc_id, bg)` — one row per
    * token TRANSITION, `bg = h1·2³¹ + h2` over the 31-bit token
    * hashes. Keys are assembled inside the token-hash array
    * (`zip_with` of the two shifted slices, the [[TextFns.tokens]]
    * bigram shape over hashes) so no per-position explode-then-self-
    * join ever materializes and no token STRING survives its scan
    * task; the hash array is a concrete column before the zip (the
    * [[TextFns.tokenHashes]] materialization rule), and docs with < 2
    * tokens drop via [[bigramKeys]]'s when-guard + empty explode, NOT
    * via a Filter the optimizer would push below the projection.
    */
  private[llm] def hashedBigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextFns.tokenHashes(col("text")).as("hs"))
      .select(col("doc_id"), explode(bigramKeys(col("hs"))).as("bg"))

  /** The packed bigram keys of one CONCRETE token-hash array column:
    * empty (not an error, not null) for arrays with < 2 hashes or a
    * null array, so `explode` is the row filter and no predicate ever
    * carries the gram pipeline.
    */
  private def bigramKeys(hs: Column): Column =
    when(size(hs) >= 2, zip_with(
      slice(hs, lit(1), size(hs) - 1),
      slice(hs, lit(2), size(hs) - 1),
      (a, b) => a * lit(1L << 31) + b))
      .otherwise(array().cast("array<long>"))
}
