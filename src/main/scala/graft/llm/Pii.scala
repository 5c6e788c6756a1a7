package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrubbing pass a training-data pipeline runs
  * after dedup/quality curation: emails, IPv4 addresses, and phone-ish
  * digit runs are replaced with typed placeholder tokens, with
  * per-category match counts kept for auditing.
  *
  * Pure `regexp_replace`/`regexp_count` column pipeline: per-row,
  * codegen'd, no shuffle — it fuses into whatever scan precedes it.
  * The patterns avoid everything RE2 lacks (no backreferences, no
  * lookaround), so the DuckDB oracle runs the SAME pattern text with
  * `'g'`-flagged `regexp_replace` and byte-identical results.
  *
  * Order matters and is fixed: emails first (an email contains
  * dot-separated tokens an IP pattern could nibble), then IPs, then
  * phone runs (by then every digit left is a genuine candidate).
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** 9+ total chars of digits/space/dash with digit ends, optional +. */
  val PhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  /** Any-PII detector: the three category patterns as ONE alternation,
    * for gates that only need "does this doc carry PII at all"
    * ([[Curation.releaseGate]]'s pii fraction) — one regex scan of the
    * text instead of three (r17 VERDICT #3: the 3× `rlike` chain was
    * a measured slice of q100's gap). `rlike(AnyRe)` ≡
    * `rlike(EmailRe) || rlike(Ipv4Re) || rlike(PhoneRe)` — alternation
    * of the unanchored patterns detects exactly the union.
    */
  val AnyRe = s"(?:$EmailRe)|(?:$Ipv4Re)|(?:$PhoneRe)"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** `text` with all three categories redacted, in the fixed order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      PhoneRe, PhoneTag)

  /** Docs with `text` redacted in place plus audit columns
    * (`n_emails`, `n_ips`, `n_phones`). Counts are measured at the
    * same pipeline stage the corresponding replace runs (IPs counted
    * after emails are gone, phones after both), so they equal the
    * number of replacements actually made.
    */
  def redactDocs(docs: DataFrame): DataFrame = {
    val noMail = regexp_replace(col("text"), EmailRe, EmailTag)
    val noIp = regexp_replace(noMail, Ipv4Re, IpTag)
    docs
      .withColumn("n_emails",
        regexp_count(col("text"), lit(EmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(noMail, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(noIp, lit(PhoneRe)).cast("long"))
      .withColumn("text", regexp_replace(noIp, PhoneRe, PhoneTag))
  }
}
