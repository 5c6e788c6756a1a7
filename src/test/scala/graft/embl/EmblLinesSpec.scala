package graft.embl

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's four regex unit suites
  * (tests/regex_test.py:6-95), asserted against [[EmblLines]].
  */
class EmblLinesSpec extends AnyFunSuite {

  test("ID line regex (regex_test.py:6-23)") {
    assert(EmblLines.parseIdLine(
      "ID   CP002679; SV 1; circular; genomic DNA; STD; PRO; 1038839 BP.")
      === EmblLines.IdInfo("CP002679", 0, 1038839L))
    assert(EmblLines.parseIdLine(
      "ID   BFMR01000110; SV 1; linear; genomic DNA; STD; PRO; 11440 BP.")
      === EmblLines.IdInfo("BFMR01000110", 1, 11440L))
    // XXX structure parses but is tombstoned (parse_embl.py:339-350)
    assert(EmblLines.parseIdLine(
      "ID   HC710378; SV 1; XXX; protein; PRT; PRO; 409 BP.")
      === EmblLines.Tombstone)
    // uninteresting line
    assert(EmblLines.parseIdLine("FT   source          1..478325")
      === EmblLines.Tombstone)
    // missing chromosome length
    assert(EmblLines.parseIdLine(
      "ID   CP002679; SV 1; circular; genomic DNA; STD; PRO;")
      === EmblLines.Tombstone)
  }

  test("feature-block start regex (regex_test.py:26-40)") {
    val lines =
      """ID   ABZA01000001; SV 1; linear; genomic DNA; WGS; PRO; 478325 BP.
        |XX
        |FT   source          1..478325
        |FT                   /organism="Wolbachia endosymbiont of Culex quinquefasciatus
        |FT                   JHB"
        |FT                   /db_xref="taxon:569881"
        |FT   gene            <1..1701
        |FT                   /locus_tag="C1A_288"
        |FT   CDS             <1..1701""".stripMargin.split("\n").toSeq
    val groundTruth =
      Seq(false, false, true, false, false, false, true, false, true)
    assert(lines.map(EmblLines.isFeatureStart) === groundTruth)
  }

  test("XREF line regexes (regex_test.py:43-56)") {
    val lines =
      Seq(
        "FT   CDS             <1..1701",
        "FT                   /db_xref=\"InterPro:IPR023614\"",
        "FT                   /db_xref=\"UniProtKB/TrEMBL:B6Y618\"",
        "FT                   /protein_id=\"EEB56106.1\"",
        "FT   CDS             complement(1822..1956)",
        "FT                   /locus_tag=\"C1A_289\"",
        "FT                   /db_xref=\"UniProtKB/TrEMBL:B6Y619\"",
        "FT                   /protein_id=\"EEB56107.1\"",
        "FT                   /translation=\"MLKYNVSDDDGKMDPSVKHWDDTIYYANCHNFRTAVTGMTLLIV\" ")
    val groundTruth =
      Seq(false, false, true, true, false, false, true, true, false)
    val matched = lines.map(l =>
      EmblLines.uniprotId(l).isDefined || EmblLines.proteinId(l).isDefined)
    assert(matched === groundTruth)
    // extracted values
    assert(EmblLines.uniprotId(lines(2)) === Some("B6Y618"))
    assert(EmblLines.proteinId(lines(3)) === Some("EEB56106.1"))
    assert(EmblLines.uniprotId(lines(6)) === Some("B6Y619"))
    assert(EmblLines.proteinId(lines(7)) === Some("EEB56107.1"))
  }

  test("location range regex (regex_test.py:59-95)") {
    val cases: Seq[(String, Seq[(Long, Long)])] = Seq(
      "FT   CDS             J00194.1:100..202" -> Seq((100L, 202L)),
      "FT   CDS             467        # we ignore these" -> Seq(),
      "FT   CDS             340..565" -> Seq((340L, 565L)),
      "FT   CDS             <345..500" -> Seq((345L, 500L)),
      "FT   CDS             <1..888" -> Seq((1L, 888L)),
      "FT   CDS             1..>888" -> Seq((1L, 888L)),
      "FT   CDS             102.110    # we ignore these" -> Seq(),
      "FT   CDS             123^124    # we ignore these" -> Seq(),
      "FT   CDS             join(12..78,134..202)" -> Seq((12L, 78L), (134L, 202L)),
      "FT   CDS             join(12..78,1..3)" -> Seq((12L, 78L), (1L, 3L)),
      "FT   CDS             complement(34..126)" -> Seq((34L, 126L)),
      "FT   CDS             complement(join(2691..4571,4918..5163))" ->
        Seq((2691L, 4571L), (4918L, 5163L)),
      "FT   CDS             complement(join(1,2691..4571,4918..5163))" ->
        Seq((2691L, 4571L), (4918L, 5163L)),
      "FT   CDS             join(complement(4918..5163),complement(2691..4571))" ->
        Seq((4918L, 5163L), (2691L, 4571L)),
      "FT   CDS             join(1..100,J00194.1:100..202) " ->
        Seq((1L, 100L), (100L, 202L)))
    cases.foreach { case (line, expected) =>
      assert(EmblLines.locRanges(line) === expected, s"line: $line")
    }
  }

  test("location scrub (parse_embl.py:129-132)") {
    val joined = "FT   CDS             complement(join(2691..4571,\nFT                   4918..5163))\nFT                   /locus_tag=\"x\"\n"
    val scrubbed = EmblLines.scrubLocationText(joined)
    assert(scrubbed === "complement(join(2691..4571,4918..5163))")
    assert(EmblLines.locRanges(scrubbed) === Seq((2691L, 4571L), (4918L, 5163L)))
  }

  test("taxonomy anti-filter (parse_embl.py:527-535)") {
    assert(!EmblLines.ocLineDropsRecord(
      "OC   Bacteria; Proteobacteria; Alphaproteobacteria."))
    assert(EmblLines.ocLineDropsRecord(
      "OC   Eukaryota; Metazoa; Chordata; Mammalia."))
    assert(!EmblLines.ocLineDropsRecord(
      "OC   Eukaryota; Fungi; Ascomycota."))
  }
}
