package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: conceptually concatenate the corpus's
  * token stream in doc_id order and cut fixed `blockSize`-token
  * training blocks; emit which docs land in which block (a doc
  * straddling a boundary appears in both). This is the standard
  * "concat-then-chunk" batching used to build training sequences —
  * the curation step between a cleaned corpus and a dataloader.
  *
  * THE GLOBAL PREFIX SUM IS THE SCALE HAZARD: `sum() OVER (ORDER BY
  * doc_id)` with no PARTITION BY funnels the whole corpus through one
  * partition. This implementation is the classic two-phase scan
  * instead:
  *
  *  1. docs aggregate into coarse `groupWidth`-wide doc_id groups →
  *     per-group token totals (corpus/groupWidth rows — tiny);
  *  2. ONE window over those group totals yields each group's global
  *     starting offset (single-partition, but over the tiny relation);
  *  3. the offsets broadcast-join back and the per-doc running sum
  *     windows PARTITION BY group — embarrassingly parallel.
  *
  * Every wide operation is keyed (group id); the only unpartitioned
  * window touches ~n/groupWidth rows.
  */
object Packing {

  /** Per-block assignment summary: `(block_id, n_docs,
    * n_block_tokens, first_doc, last_doc)`, where `n_block_tokens`
    * counts the tokens each block actually holds (= blockSize for
    * every block except the last). Docs with zero tokens occupy no
    * block positions and are dropped.
    */
  def packBlocks(
      docs: DataFrame,
      blockSize: Long,
      groupWidth: Long = 4096): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val toks = TextDedup.spread(docs, "doc_id")
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("nt"))
      .withColumn("grp", expr(s"doc_id div $groupWidth"))

    // the two-phase scan is the shared [[graft.operators.PrefixSum]]
    // kernel (r14 VERDICT #1 — one kernel, every caller): bucket =
    // the coarse doc_id group, within-bucket order = doc_id, and the
    // exclusive start offset is the inclusive prefix minus the row's
    // own (non-null) token count
    val placed = graft.operators.PrefixSum
      .inclusive(toks, Seq.empty, "grp", Seq(col("doc_id")), col("nt"),
        "__cum")
      .withColumn("start", col("__cum") - col("nt"))
      .drop("__cum")
      .filter(col("nt") > 0) // zero-token docs span no block (and an
      //  empty span would make sequence() below count DOWN, not empty)
      .withColumn("block_id", explode(sequence(
        expr(s"start div $blockSize"),
        expr(s"(start + nt - 1) div $blockSize"))))

    placed
      .groupBy(col("block_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(
          least(col("start") + col("nt"), (col("block_id") + 1) * blockSize) -
            greatest(col("start"), col("block_id") * blockSize))
          .as("n_block_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Padding-efficiency report — the OTHER batching strategy's cost
    * model: where [[packBlocks]] concatenates (zero padding, docs
    * split across blocks), length-bucketed batching keeps docs whole
    * and pads each to its bucket ceiling (the next multiple of
    * `bucketWidth`; an exact multiple pads zero). Per bucket:
    * doc count, real tokens, padding tokens, and the padding fraction
    * of the padded total — the wasted-FLOPs number that decides
    * between the two strategies for a given corpus shape.
    *
    * Scale: bucket and padding are per-row integer arithmetic; the
    * report is ONE keyed aggregation (map-side partial) over
    * corpus-length/bucketWidth distinct keys. Zero-token docs land in
    * bucket 0 with zero padding.
    */
  def paddingEfficiency(docs: DataFrame, bucketWidth: Int = 32): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // greatest(…, 0): size(NULL) is -1 under non-ANSI — a null text is
    // a zero-token doc here, not a negative-length one
    val len = greatest(size(TextFns.tokens(col("text"))).cast("long"), lit(0L))
    val pad = pmod(lit(bucketWidth.toLong) - pmod(len, lit(bucketWidth.toLong)),
      lit(bucketWidth.toLong))
    docs
      // keyed by the padded length itself: every doc in a bucket pads
      // to exactly bucket_ceil (an exact multiple is its own ceiling)
      .select((len + pad).as("bucket_ceil"), len.as("len"), pad.as("pad"))
      .groupBy(col("bucket_ceil"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("len")).as("n_tokens"),
        sum(col("pad")).as("n_padding"),
        // greatest(…, 1) guards the all-zero-token bucket (0/0): its
        // padding fraction is legitimately 0, not NaN
        round(sum(col("pad")).cast("double") /
          greatest(sum(col("pad")) + sum(col("len")), lit(1L)), 9)
          .as("pad_frac"))
  }

  /** Fixed-stride overlapping window chunking — the serving/indexing
    * twin of [[packBlocks]]'s training batching: each document is cut
    * into `size`-token chunks whose starts advance by
    * `size - overlap`, so consecutive chunks share `overlap` tokens
    * of context (retrieval passages, context-window splits, embedding
    * inputs). Emits one row per chunk: `(doc_id, chunk_idx,
    * start_tok, n_toks, chunk_text, chunk_hash)`; the final chunk may
    * be short, a doc with ≤ `size` tokens is exactly one chunk, and a
    * zero-token doc emits none. `chunk_hash` (60-bit md5) keys
    * downstream chunk-level dedup without re-tokenizing.
    *
    * Scale: pure per-row arithmetic — tokenize, an integer chunk-count
    * expression, one `posexplode` over the chunk index range, and
    * `slice` per chunk, all inside whole-stage codegen; no shuffle at
    * all, output is doc_id-clustered for free. Output volume is
    * input × (1 + overlap/stride) — the overlap factor, not a blowup.
    */
  def strideChunks(
      docs: DataFrame,
      chunkSize: Int = 128,
      overlap: Int = 32): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val stride = chunkSize - overlap
    val n = size(col("__w"))
    // chunks = 1 + ceil((n - size)/stride) for n > size, else 1 —
    // integer form (a + b - 1) / b with positive operands only
    val lastIdx = when(n <= chunkSize, lit(0))
      .otherwise(((n - chunkSize + (stride - 1)) / lit(stride)).cast("int"))
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__w"))
      .filter(size(col("__w")) > 0)
      .select(col("doc_id"), col("__w"), n.as("__n"),
        posexplode(sequence(lit(0), lastIdx)))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        (col("pos") * stride).cast("long").as("start_tok"),
        least(lit(chunkSize), col("__n") - col("pos") * stride)
          .cast("long").as("n_toks"),
        array_join(slice(col("__w"), col("pos") * stride + 1, lit(chunkSize)),
          " ").as("chunk_text"))
      .withColumn("chunk_hash", TextFns.hash60(col("chunk_text")))
  }
}
