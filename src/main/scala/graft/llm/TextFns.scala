package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline layer
  * (tokenization, shingling, portable hashing). Everything here is a
  * built-in-function composition — no UDFs — so the whole layer stays
  * inside WholeStageCodegen and is oracle-mirrorable in ANSI SQL.
  *
  * Hash portability: `hash60` is the first 60 bits of md5 as a positive
  * long. md5 is bit-identical everywhere, and 15 hex digits fit a signed
  * 64-bit int, so DuckDB (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`)
  * and Spark (`conv(substr(md5(x),1,15),16,10)`) agree exactly — unlike
  * engine-native hashes (xxhash64/murmur), which differ across engines.
  */
object TextFns {

  /** Whitespace tokens of lower-cased text, empty tokens dropped
    * (multi-space safe). Mirrors DuckDB
    * `list_filter(string_split(lower(text),' '), x -> x <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Word k-gram shingles with multiplicity; empty array when the doc
    * has fewer than k tokens. (Guarded: Spark's `sequence(0, n)` with
    * n < 0 would generate a *descending* sequence, not an empty one.)
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
      .otherwise(array())

  /** BPE-ish regex tokenization: word pieces and individual
    * non-space punctuation as separate tokens (the pre-tokenization
    * split BPE vocabularies train over), vs the whitespace tokens of
    * [[tokens]]. Mirrors DuckDB `regexp_extract_all(text, pattern)`.
    */
  val BpeTokenPattern = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeTokenPattern), lit(0))

  /** Distinct word k-gram shingle set. */
  def shingleSet(text: Column, k: Int): Column =
    array_distinct(shingles(tokens(text), k))

  /** First 60 bits of md5 as a positive long — the engine-portable
    * stand-in for a seeded hash function. Evaluates through the
    * native [[graft.functions.Hash60]] kernel (bit-identical to
    * `conv(substring(md5(c),1,15),16,10)`, no hex-string churn);
    * callers' DataFrame entry points must have run
    * `GraftFunctions.ensureRegistered` on the session (every operator
    * below does).
    */
  def hash60(c: Column): Column =
    call_function(graft.functions.GraftFunctions.Hash60Name, c)

  /** 31-bit base hash (low bits of hash60) for universal-hash
    * permutation families: small enough that `a*h + b` stays far from
    * 64-bit overflow (ANSI mode would throw) in both engines.
    */
  def hash31(c: Column): Column = hash60(c).bitwiseAND(lit(0x7FFFFFFFL))

  /** MinHash universal-hash permutation of a 31-bit base hash:
    * (a_s·h + b_s) mod p with p = 2^31 - 1. ONE md5 per shingle total —
    * benchmarked 12× cheaper than md5-per-seed at 12 permutations.
    */
  val MinhashP = 2147483647L
  def minhashPerm(seed: Int, h: Column): Column =
    (h * lit(1000003L + 97L * seed) + lit(12345L + 31L * seed)) % lit(MinhashP)

  /** Coefficient for position j of the polynomial k-gram hash (the
    * same multiplier family as [[minhashPerm]]): the k-gram's hash is
    * Σⱼ (hⱼ·coefⱼ mod p) mod p over its token hashes — every
    * intermediate < 2^62 (31-bit h × 31-bit coef), ANSI-overflow-safe
    * and integer-exact in both engines.
    */
  def shingleCoef(j: Int): Long = 1000003L + 97L * j

  /** Second, independent coefficient family: fingerprints pack TWO
    * 31-bit gram hashes into one 62-bit value (`a·2³¹ + b`) — a single
    * 31-bit min-hash space would concentrate the per-doc minimum near
    * 0 at corpus scale (E[min of m hashes] ≈ 2³¹/m), colliding
    * unrelated docs on equal fingerprints.
    */
  def shingleCoefB(j: Int): Long = 2000029L + 193L * j

  /** The per-token 31-bit hash array — materialize this as a REAL
    * column (one `withColumn`) before calling [[fingerprintFromHashes]]
    * on it. Inlining it into the gram HOF instead is quadratic: the
    * lambda references the array ~2k× per output element, and without
    * common-subexpression elimination the whole tokenize+md5 pipeline
    * re-runs per reference (measured: >500 s for a corpus-wide scan
    * that takes ~1 s with the array concrete). `CollapseProject` will
    * NOT fuse the two projections back together — the alias is
    * non-cheap and multiply-referenced.
    */
  def tokenHashes(text: Column): Column = transform(tokens(text), t => hash31(t))

  /** Per-row document fingerprint (minimum 62-bit packed polynomial
    * k-gram hash) over a CONCRETE token-hash array column — the
    * stateless, streaming-safe twin of the batch fingerprint in
    * `TextDedup.fingerprintPairs` (which assembles grams with window
    * `lead`s; window functions don't exist on streaming DataFrames).
    * Same token hashes, same coefficient families, same packing —
    * values are identical (asserted in StreamOpsSpec), so a streaming
    * dedup keyed on this column agrees with a batch backfill. NULL for
    * docs with fewer than k tokens. `element_at` on an attribute is a
    * cheap array lookup, so per-row cost is O(tokens × k) — safe on
    * corpus-wide scans AND per stream event.
    */
  def fingerprintFromHashes(hs: Column, k: Int): Column = {
    def gram(coef: Int => Long)(i: Column) = (0 until k).map(j =>
        (element_at(hs, i + lit(j + 1)) * lit(coef(j))) % lit(MinhashP))
      .reduce(_ + _) % lit(MinhashP)
    val packed = transform(sequence(lit(0), size(hs) - k),
      i => gram(shingleCoef)(i) * lit(1L << 31) + gram(shingleCoefB)(i))
    when(size(hs) >= k, array_min(packed)).otherwise(lit(null).cast("long"))
  }

  /** ALL polynomial k-gram hashes of one CONCRETE token-hash array
    * column, assembled IN-ROW (`element_at` lookups over the array —
    * no posexplode, no per-doc window, no exchange): the array twin of
    * [[graft.llm.TextDedup.gramHashes]]'s window form, emitting the
    * IDENTICAL `gh` values (same [[shingleCoef]] family, same mod-p
    * fold — asserted in LlmLayerSpec), so per-document gram statistics
    * (decontamination overlap, distinct-gram counts) become pure
    * projections: a 100 TB corpus audit runs as ONE scan with zero
    * shuffles when the lookup side rides a broadcast probe. Empty (not
    * null) for docs with fewer than k tokens or null text — `size`/
    * `filter` over the result then yield 0-valued stats, the same
    * "too short to leak an n-gram" semantics as the join form's
    * left-join restore. Like [[fingerprintFromHashes]], call this on a
    * MATERIALIZED hash-array column only (see [[tokenHashes]]).
    */
  def gramHashArray(hs: Column, k: Int): Column = {
    def gram(i: Column) = (0 until k).map(j =>
        (element_at(hs, i + lit(j + 1)) * lit(shingleCoef(j))) % lit(MinhashP))
      .reduce(_ + _) % lit(MinhashP)
    when(size(hs) >= k, transform(sequence(lit(0), size(hs) - k), gram(_)))
      .otherwise(array().cast("array<long>"))
  }

  /** Single-expression convenience form of the fingerprint. ONLY for
    * one-off scalar use (e.g. fingerprinting a literal): on a table
    * scan the inlined token-hash array makes it quadratic — use
    * `withColumn("hs", tokenHashes(text))` +
    * [[fingerprintFromHashes]] instead (see [[tokenHashes]]).
    */
  def fingerprint(text: Column, k: Int): Column =
    fingerprintFromHashes(tokenHashes(text), k)

}
