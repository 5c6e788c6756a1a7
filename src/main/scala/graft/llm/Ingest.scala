package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw-ingest hardening — the step between "bytes arrived" and "rows
  * exist": real training-data feeds (crawl dumps, vendor drops,
  * JSONL exports) always contain a corrupt tail — truncated records,
  * mangled quoting, schema drift — and the pipeline's contract is to
  * QUARANTINE those rows with full fidelity, never to fail the batch
  * and never to silently drop. Spark's native answer is permissive
  * parsing (`from_json` → null on malformed), and these operators wrap
  * it into the audited keep/quarantine split every ingest job runs.
  */
object Ingest {

  /** Schema-validated JSONL parse with corrupt-record quarantine:
    * every input row keeps its original line plus `is_valid` and the
    * parsed columns (null where invalid) — callers route
    * `filter(is_valid)` into the pipeline and the complement into a
    * quarantine sink WITH the raw line preserved (the re-ingest
    * contract: a fixed parser can replay quarantined bytes).
    *
    * Scale shape: `from_json` is a codegen'd per-row projection — the
    * parse fuses into the scan, no shuffle, no driver involvement.
    * Validity rides Spark's own corrupt-record channel: the schema is
    * augmented with a `columnNameOfCorruptRecord` field that PERMISSIVE
    * parsing fills with the raw input ONLY on malformed rows (a
    * null-struct test does not work — Spark 4 yields a struct of null
    * FIELDS for malformed input, indistinguishable from a valid record
    * of nulls). Cross-engine: q145 gates the accept/reject verdict AND
    * the extracted fields against DuckDB's independent JSON parser
    * (`json_valid` / `json_extract`), so a parser-behavior drift on
    * either side breaks the hash.
    */
  def parseJsonlQuarantine(
      lines: DataFrame,
      schema: StructType,
      lineCol: String = "line"): DataFrame = {
    val corrupt = "_graft_corrupt"
    for (reserved <- Seq(corrupt, lineCol, "is_valid"))
      require(!schema.fieldNames.contains(reserved),
        s"schema must not contain the output column '$reserved'")
    val parseSchema = schema.add(corrupt,
      org.apache.spark.sql.types.StringType)
    val parsed = from_json(col(lineCol), parseSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt))
    lines
      .withColumn("__p", parsed)
      // THREE conditions: a NULL input line is invalid; a NULL parsed
      // struct is invalid — Spark returns a NULL struct (corrupt field
      // unreachable, hence NULL too) for EMPTY/whitespace-only input,
      // which json_valid('') also rejects, so blank feed lines (every
      // real dump's trailing newline) quarantine instead of flowing
      // through as all-null "valid" rows; otherwise the corrupt
      // channel is the verdict
      .withColumn("is_valid",
        col(lineCol).isNotNull && col("__p").isNotNull &&
          col(s"__p.$corrupt").isNull)
      .select(Seq(col(lineCol), col("is_valid")) ++
        schema.fields.map(f => col(s"__p.${f.name}").as(f.name)): _*)
  }

  /** The ingest AUDIT row: one line per batch —
    * `(n_rows, n_valid, n_quarantined, valid_frac)` — the number a
    * feed's health dashboard plots and a release gate thresholds.
    */
  def ingestAudit(
      lines: DataFrame,
      schema: StructType,
      lineCol: String = "line"): DataFrame =
    parseJsonlQuarantine(lines, schema, lineCol)
      .agg(
        count(lit(1)).as("n_rows"),
        // coalesce: an EMPTY batch (sum over zero rows is NULL) must
        // report zeros, not NULLs a threshold gate can't evaluate
        coalesce(sum(when(col("is_valid"), 1L).otherwise(0L)), lit(0L))
          .as("n_valid"),
        coalesce(sum(when(col("is_valid"), 0L).otherwise(1L)), lit(0L))
          .as("n_quarantined"))
      // empty batch → vacuously all-valid (1.0), so a `valid_frac ≥ x`
      // health gate passes on a clean-but-empty feed instead of
      // evaluating NULL
      .withColumn("valid_frac",
        when(col("n_rows") === 0, lit(1.0))
          .otherwise(col("n_valid").cast("double") / col("n_rows")))
}
