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

    val trainUni = refDocs
      .select(explode(TextFns.tokenHashes(col("text"))).as("uh"))
      .groupBy(col("uh"))
      .agg(count(lit(1)).as("c_a"))
    // V as a one-row frame: a literal would force an eager job here;
    // the cross-join keeps the whole score lazy and single-action.
    // V = 0 (empty/token-free reference) raises instead of silently
    // disabling the gate (r16 ADVICE): with c_a = 0 everywhere the
    // rare predicate rarity·(c_ab+1) < c_a+V can never hold, so every
    // doc would score 0 rare bigrams and keep=true.
    val vocab = trainUni.agg(count(lit(1)).as("__v"))
      .select(when(col("__v") === 0, raise_error(lit(
        "rareTransitionScore: reference corpus has an empty vocabulary" +
          " (no tokens) — the rarity gate would pass every document")))
        .otherwise(col("__v")).as("v"))

    val trainBg = hashedBigrams(refDocs).groupBy(col("bg"))
      .agg(count(lit(1)).as("c_ab"))

    // per-doc distinct bigrams with multiplicity: the model join pays
    // one row per DISTINCT (doc, bigram), the count multiplies back;
    // the unigram context key is the packed key's top 31 bits
    val docBg = hashedBigrams(docs)
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("n"))
      .withColumn("uh", shiftright(col("bg"), 31))

    val rare = (lit(rarity) * (coalesce(col("c_ab"), lit(0L)) + 1L)) <
      (coalesce(col("c_a"), lit(0L)) + col("v"))
    val perDoc = docBg
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
    * (`arrays_zip` of the two shifted slices, the [[TextFns.tokens]]
    * bigram shape over hashes) so no per-position explode-then-self-
    * join ever materializes and no token STRING survives its scan
    * task; the hash array is a concrete column before the zip (the
    * [[TextFns.tokenHashes]] materialization rule).
    */
  private[llm] def hashedBigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextFns.tokenHashes(col("text")).as("hs"))
      .filter(size(col("hs")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("hs"), lit(1), size(col("hs")) - 1).as("h1"),
          slice(col("hs"), lit(2), size(col("hs")) - 1).as("h2"))).as("p"))
      .select(col("doc_id"),
        (col("p.h1") * lit(1L << 31) + col("p.h2")).as("bg"))
}
