package graft.embl

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Self-contained flagship input for `SparkEntry.entry`: a deterministic
  * gzipped EMBL source tree (same shapes as the reference's EMBL corpus —
  * circular wraparound CDS, complement strand, taxonomy-dropped record,
  * tombstoned XXX structure, division-pruned file; see
  * reference parse_embl.py:444-570) materialized under java.io.tmpdir,
  * plus a small idmapping side relation. Writing the fixture lazily at
  * first use keeps the repo free of binary blobs while making `entry`
  * runnable anywhere.
  */
object FlagshipFixture {

  /** Shared with the e2e spec fixtures (was duplicated there). */
  private[embl] def writeGz(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path.toFile)), "UTF-8"))
    try w.write(content) finally w.close()
  }

  /** Idempotent: (re)writes the fixture tree and returns its root. */
  def ensureFixture(): Path = {
    val root = Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_flagship_fixture")
    writeGz(root.resolve("sequence/con/rel_std_PRO_01_r143.dat.gz"),
      """ID   CIRC01; SV 1; circular; genomic DNA; STD; PRO; 1000 BP.
        |XX
        |OC   Bacteria; Proteobacteria.
        |XX
        |FT   source          1..1000
        |FT                   /organism="Test bug"
        |FT   CDS             join(900..1000,1..70)
        |FT                   /protein_id="AAA1.1"
        |FT   gene            200..300
        |FT   CDS             complement(200..300)
        |FT                   /db_xref="UniProtKB/TrEMBL:U_FALL"
        |ID   DROP01; SV 1; linear; genomic DNA; STD; MAM; 5000 BP.
        |OC   Eukaryota; Metazoa; Chordata.
        |FT   CDS             10..200
        |FT                   /protein_id="BBB1.1"
        |ID   FUN01; SV 1; linear; genomic DNA; STD; FUN; 800 BP.
        |OC   Eukaryota; Fungi; Ascomycota.
        |FT   CDS             <5..>100
        |FT                   /protein_id="CCC1.1"
        |FT                   /db_xref="UniProtKB/Swiss-Prot:U_CCC"
        |""".stripMargin)
    writeGz(root.resolve("sequence/con/rel_std_HUM_01_r143.dat.gz"),
      """ID   HUM01; SV 1; linear; genomic DNA; STD; HUM; 1000 BP.
        |OC   Bacteria; pretend.
        |FT   CDS             1..10
        |FT                   /db_xref="UniProtKB/TrEMBL:U_HUM"
        |""".stripMargin)
    writeGz(root.resolve("wgs/public/wds/ABZA01.dat.gz"),
      """ID   WGS01; SV 1; linear; genomic DNA; WGS; PRO; 478325 BP.
        |OC   Bacteria; Proteobacteria.
        |FT   CDS             join(12..78,134..202)
        |FT                   /protein_id="AAA1.1"
        |FT                   /protein_id="EEB56107.1"
        |FT                   /db_xref="UniProtKB/TrEMBL:U_PARSED"
        |""".stripMargin)
    root
  }

  def idmapping(spark: SparkSession): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("AAA1.1", "P10001"),
      ("AAA1.1", "P10002"),
      ("EEB56107.1", "P20001"),
      ("ZZZ9.9", "P99999")
    ).toDF("foreign_id", "uniprot_id")
  }

  /** The flagship 7-column relation (rows > 0 by construction). */
  def enaTab(spark: SparkSession): DataFrame = {
    val root = ensureFixture()
    EnaPipeline.enaTab(spark, Seq(root.toString), idmapping(spark))
  }
}
