package graft.embl

import scala.util.matching.Regex

/** Line-level extractors for EMBL flat files.
  *
  * The patterns reproduce the observable semantics of the reference's
  * compiled regexes (reference `ena_build/parse_embl.py:16,21-47`),
  * re-expressed as plain Scala; the per-line behaviors are covered by
  * ports of the reference's regex unit tests
  * (`tests/regex_test.py:6-95`).
  */
object EmblLines {

  /** `ID` header line: group 1 = ENA accession, group 2 = chromosome
    * structure string (`linear`/`circular`/other), group 3 = length in
    * base pairs (parse_embl.py:16).
    */
  val IdLinePattern: Regex =
    """^ID\s+(\w+);\s\w+\s\w+;\s(\w+);.*;\s(\d+)\sBP""".r

  /** `/protein_id="..."` qualifier (parse_embl.py:22). */
  val ProteinIdPattern: Regex =
    """^FT\s+/protein_id="([a-zA-Z0-9.]+)"""".r

  /** `/db_xref="UniProtKB/...:ACC"` qualifier (parse_embl.py:23). */
  val UniprotXrefPattern: Regex =
    """^FT\s+/db_xref="UniProtKB/[a-zA-Z0-9-]+:(\w+)"""".r

  /** Location range `lo..hi` (with optional `>` fuzz on hi); deliberately
    * does NOT match single-base `102`, site `102^112`, or fuzzy `102.110`
    * forms (parse_embl.py:40-43).
    */
  val LocRangePattern: Regex = """(\d+)\.\.>?(\d+)""".r

  /** Start of any feature block: `FT` + exactly 3 spaces + feature key
    * character (parse_embl.py:47).
    */
  val FtStartPattern: Regex = """^FT\s\s\s[a-zA-Z0-9-]""".r

  /** Parsed `ID` line. `enaId == ""` is the reference's tombstone for
    * malformed or non-linear/circular entries (parse_embl.py:339-359).
    */
  final case class IdInfo(enaId: String, chrStruct: Int, chrLen: Long)

  val Tombstone: IdInfo = IdInfo("", -1, 0L)

  /** Mirror of `process_id_line` (parse_embl.py:309-361): linear -> 1,
    * circular -> 0, anything else (or no match) -> tombstone.
    */
  def parseIdLine(line: String): IdInfo =
    IdLinePattern.findFirstMatchIn(line) match {
      case Some(m) =>
        m.group(2) match {
          case "linear"   => IdInfo(m.group(1), 1, m.group(3).toLong)
          case "circular" => IdInfo(m.group(1), 0, m.group(3).toLong)
          case _          => Tombstone
        }
      case None => Tombstone
    }

  /** All `lo..hi` ranges in a (scrubbed) location string
    * (parse_embl.py:135-140).
    */
  def locRanges(cdsLine: String): Seq[(Long, Long)] =
    LocRangePattern
      .findAllMatchIn(cdsLine)
      .map(m => (m.group(1).toLong, m.group(2).toLong))
      .toSeq

  def proteinId(line: String): Option[String] =
    ProteinIdPattern.findFirstMatchIn(line).map(_.group(1))

  def uniprotId(line: String): Option[String] =
    UniprotXrefPattern.findFirstMatchIn(line).map(_.group(1))

  def isFeatureStart(line: String): Boolean =
    FtStartPattern.findFirstMatchIn(line).isDefined

  /** Taxonomy anti-filter: drop the record iff the `OC` line mentions
    * `Eukaryota` without ` Fungi` (parse_embl.py:527-529) — keeps
    * prokaryotes, viruses and fungi.
    */
  def ocLineDropsRecord(line: String): Boolean =
    line.contains("Eukaryota") && !line.contains(" Fungi")

  /** Scrub a joined CDS block down to its location text: keep everything
    * before the first `/` qualifier, then strip `"FT "`, `"CDS "`,
    * newlines and spaces — in exactly that order (parse_embl.py:129-132).
    */
  def scrubLocationText(joinedLines: String): String = {
    val beforeQualifier = joinedLines.split("/", 2)(0)
    beforeQualifier
      .replace("FT ", "")
      .replace("CDS ", "")
      .replace("\n", "")
      .replace(" ", "")
  }
}
