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
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not already contain $corrupt")
    val parseSchema = schema.add(corrupt,
      org.apache.spark.sql.types.StringType)
    val parsed = from_json(col(lineCol), parseSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt))
    lines
      .withColumn("__p", parsed)
      .withColumn("is_valid",
        col(lineCol).isNotNull && col(s"__p.$corrupt").isNull)
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
        sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("is_valid"), 0L).otherwise(1L)).as("n_quarantined"))
      .withColumn("valid_frac",
        col("n_valid").cast("double") / col("n_rows"))
}
