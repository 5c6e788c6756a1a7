package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation flagship: the single operator
  * a corpus owner actually runs, chaining the curation pillars in the
  * canonical order —
  *
  *   seeded sample → benchmark decontamination → 3-stage dedup
  *   (exact / prefix / MinHash-LSH) → quality filter → sequence
  *   packing
  *
  * — and returning the packed-block summary of the surviving corpus.
  *
  * Stage order IS the scale design: stages strictly shrink the corpus
  * before the next, and the cheap ones run first. Sampling is a
  * shuffle-free codegen'd filter that fuses into the scan
  * ([[Sampling.sampleCorpus]]); decontamination's eval-gram side is
  * broadcast-sized ([[Decontaminate]]); dedup's only pair generation
  * is the banded LSH join ([[TextDedup.dedupPipeline]],
  * `maxBucketWidth`-cappable); the quality filter is explode +
  * keyed aggregation ([[TextAnalysis.qualityFilter]]); and packing's
  * only unpartitioned window runs over n/groupWidth group rows
  * ([[Packing.packBlocks]]). Each stage hands the next only a
  * `doc_id` keep-list, joined back to the (already-filtered) corpus —
  * wide document rows are never carried through a stage's own
  * shuffles.
  *
  * Oracled end-to-end as q72 (the strongest regression net over the
  * whole llm/ layer: a value drift in ANY pillar shifts the packed
  * blocks and fails the hash compare).
  */
object Curation {

  /** Curate `docs` against `evalDocs` and pack the survivors into
    * `blockSize`-token training blocks. Parameter defaults match the
    * individually-oracled stage queries (q54/q59/q60/q62/q70), so the
    * composition is exactly the audited pillars chained.
    */
  def curate(
      docs: DataFrame,
      evalDocs: DataFrame,
      sampleFraction: Double = 0.9,
      sampleSeed: String = "curate",
      decontamShingleK: Int = 3,
      maxOverlap: Double = 0.2,
      dedupShingleK: Int = 3,
      nHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      prefixK: Int = 5,
      maxBucketWidth: Option[Int] = None,
      minTokens: Long = 5,
      minTtr: Double = 0.3,
      maxStopwordRatio: Double = 0.5,
      minMeanTokLen: Double = 2.0,
      maxMeanTokLen: Double = 12.0,
      blockSize: Long = 512,
      groupWidth: Long = 4096): DataFrame = {
    val sampled = Sampling.sampleCorpus(docs, sampleFraction, sampleSeed)
    // Each stage's keep-list is localCheckpoint'd: downstream stages
    // consume their input corpus several times (dedup alone joins it
    // 4×), and without the barrier every consumer would re-run the
    // upstream stage's full gram pipeline (isolated best-of-2 A/B at
    // sf0.1: 18.6 s without the barrier → 6.9 s with it — the
    // composition now costs ≈ the sum of its stages). Only the doc_id lists are pinned — bytes-per-row tiny,
    // broadcast-sized next to the corpus — while the wide corpus rows
    // are re-derived from the (columnar, pruned) scan + broadcast
    // id-list joins, which is the right trade at 100 TB versus
    // pinning corpus blocks in executor memory.
    val cleanIds = Decontaminate
      .decontaminate(sampled, evalDocs, decontamShingleK, maxOverlap)
      .select(col("doc_id")).localCheckpoint()
    val clean = sampled.join(cleanIds, Seq("doc_id"))
    val uniqueIds = TextDedup.dedupPipeline(clean, dedupShingleK, nHashes,
      bands, threshold, prefixK, maxBucketWidth).localCheckpoint()
    val unique = clean.join(uniqueIds, Seq("doc_id"))
    val goodIds = TextAnalysis.qualityFilter(unique, minTokens, minTtr,
      maxStopwordRatio, minMeanTokLen, maxMeanTokLen)
      .select(col("doc_id")).localCheckpoint()
    val good = unique.join(goodIds, Seq("doc_id"))
    Packing.packBlocks(good, blockSize, groupWidth)
  }
}
