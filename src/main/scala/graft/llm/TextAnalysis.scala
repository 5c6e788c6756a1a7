package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents(doc_id, text, lang, source,
  * n_chars)`: corpus statistics, per-document quality scoring, token
  * frequency, and a marker-token language-ID heuristic. All pure
  * column expressions (array higher-order functions, no UDFs) — per-row
  * work stays in WholeStageCodegen; the only shuffles are the final
  * group-bys, which partial-aggregate map-side.
  */
object TextAnalysis {

  /** Corpus statistics by language: doc counts, exact char totals,
    * average length (exact integer sum ÷ count), token totals.
    */
  def langStats(docs: DataFrame): DataFrame =
    TextDedup.spread(docs, "doc_id")
      .withColumn("n_toks", size(TextFns.tokens(col("text"))).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        sum(col("n_toks")).as("total_tokens"))
      .orderBy(col("lang"))

  private val Stopwords = Seq("the", "a", "of", "and", "to")

  /** Per-document quality signals: token count, type-token ratio, mean
    * token length, stopword ratio — the length/punct/stopword family a
    * training-data filter thresholds on.
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    val w = col("w")
    TextDedup.spread(docs, "doc_id")
      .withColumn("w", TextFns.tokens(col("text")))
      // filter BEFORE the ratio projection: an empty doc would otherwise
      // divide by zero under ANSI mode (real corpora contain empty docs)
      .filter(size(w) > 0)
      .select(
        col("doc_id"),
        col("lang"),
        size(w).cast("long").as("n_tokens"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        (size(array_distinct(w)).cast("double") / size(w)).as("ttr"),
        (aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          size(w)).as("mean_tok_len"),
        (size(filter(w, x => x.isin(Stopwords: _*))).cast("double") /
          size(w)).as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Token frequency: the corpus's top-`k` tokens by occurrence count
    * with document frequency (deterministic order: count desc, token).
    */
  def tokenFrequency(docs: DataFrame, k: Int = 50): DataFrame =
    TextDedup.spread(docs, "doc_id")
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  // marker-token sets per language for the ID heuristic
  private val EnMarkers = Seq("the", "a", "of")
  private val DeMarkers = Seq("der", "die", "und")
  private val EsMarkers = Seq("el", "la", "los")

  private def hits(w: Column, markers: Seq[String]): Column =
    size(filter(w, x => x.isin(markers: _*)))

  /** Marker-token language-ID heuristic scored against the labeled
    * `lang` column: classify by max marker-hit count (ties resolved
    * en > de > es, 'unknown' when nothing hits) and emit the confusion
    * matrix. On this synthetic corpus (shared English-ish vocabulary
    * across langs) the classifier mostly predicts 'en' — the matrix
    * makes that honest rather than hiding it.
    */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val w = TextFns.tokens(col("text"))
    TextDedup.spread(docs, "doc_id")
      .select(col("lang"),
        hits(w, EnMarkers).as("he"),
        hits(w, DeMarkers).as("hd"),
        hits(w, EsMarkers).as("hs"))
      .withColumn("predicted",
        when(col("he") === 0 && col("hd") === 0 && col("hs") === 0, "unknown")
          .when(col("he") >= col("hd") && col("he") >= col("hs"), "en")
          .when(col("hd") >= col("hs"), "de")
          .otherwise("es"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }
}
