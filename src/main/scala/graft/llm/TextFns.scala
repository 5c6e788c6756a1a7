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

  /** Distinct word k-gram shingle set. */
  def shingleSet(text: Column, k: Int): Column =
    array_distinct(shingles(tokens(text), k))

  /** First 60 bits of md5 as a positive long — the engine-portable
    * stand-in for a seeded hash function.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: h_seed(x) = hash60(seed || '|' || x). Distinct
    * seeds give (approximately) independent permutations for MinHash.
    */
  def hash60Seeded(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed|"), c))

  /** MinHash signature columns mh_0..mh_{n-1}: per seed, the minimum
    * seeded hash over the shingle set (computed per-row over the array —
    * no explode, no shuffle).
    */
  def minhashCols(shingleSet: Column, nHashes: Int): Seq[Column] =
    (0 until nHashes).map { s =>
      array_min(transform(shingleSet, x => hash60Seeded(s, x))).as(s"mh_$s")
    }
}
