package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The reference-compatible `--db-config` CLI surface: INI parsing
  * (dask_tskmgr.py:92–120 semantics), flag parsing (dask_tskmgr.py:
  * 80–91), and the resolved launch spec. No SparkSession needed.
  */
class DbConfigSpec extends AnyFunSuite {

  private def writeIni(text: String): String = {
    val f = Files.createTempFile("dbconf", ".ini")
    Files.write(f, text.getBytes("UTF-8"))
    f.toString
  }

  private val GoodIni =
    """; EFI database connection
      |[database]
      |user = efi_user
      |password = s3cret
      |host = db.example.org
      |port = 3306
      |""".stripMargin

  test("parseIni: sections, comments, = and : separators, key case") {
    val m = DbConfig.parseIni(
      "# c\n[database]\nUser: u\npassword = p\n\n[other]\nk=v")
    assert(m("database") === Map("user" -> "u", "password" -> "p"))
    assert(m("other") === Map("k" -> "v"))
    intercept[IllegalArgumentException](DbConfig.parseIni("orphan line"))
  }

  test("load: builds the JDBC url; missing key gets the reference's message") {
    val db = DbConfig.load(writeIni(GoodIni))
    // useCursorFetch pins MySQL Connector/J to server-side cursor
    // batching — without it a positive fetchsize is ignored and the
    // whole result set buffers in executor memory (dialect pin; the
    // reference streams idmapping in 1000-row cursor batches)
    assert(db.jdbcUrl("efi_db") ===
      "jdbc:mysql://db.example.org:3306/efi_db?useCursorFetch=true")
    assert(db.user === "efi_user" && db.password === "s3cret")
    val noPort = writeIni("[database]\nuser=u\npassword=p\nhost=h\n")
    val ex = intercept[IllegalArgumentException](DbConfig.load(noPort))
    assert(ex.getMessage.contains("'port' is missing"))
  }

  test("parseCli: reference flags, multi-value --ena-paths, ignored dask flags") {
    val cli = DbConfig.parseCli(Seq(
      "--db-config", "/c.ini", "-dbn", "efi", "--output-dir", "/out",
      "--scheduler-file", "/sched.json", "--n-workers", "16",
      "--ena-paths", "/ena/a", "/ena/b", "--tskmgr-log-file", "/log"))
    assert(cli.dbConfig === Some("/c.ini") && cli.dbName === Some("efi"))
    assert(cli.outputDir === Some("/out") && cli.nWorkers === Some(16))
    assert(cli.enaPaths === Seq("/ena/a", "/ena/b"))
    intercept[IllegalArgumentException](DbConfig.parseCli(Seq("--bogus", "x")))
  }

  test("resolveArgs: flag form builds a JDBC launch; positional form unchanged") {
    val ini = writeIni(GoodIni)
    val l = EnaMain.resolveArgs(Seq(
      "--db-config", ini, "--db-name", "efi", "--output-dir", "/out",
      "--ena-paths", "/ena/a", "--n-workers", "8"))
    assert(l.idmappingSource ===
      "jdbc:mysql://db.example.org:3306/efi?useCursorFetch=true")
    assert(l.user === Some("efi_user") && l.password === Some("s3cret"))
    assert(l.outDir === "/out" && l.roots === Seq("/ena/a"))
    assert(l.nWorkers === Some(8))

    val p = EnaMain.resolveArgs(Seq("/out", "/idmap.parquet", "/ena/a", "/ena/b"))
    assert(p.idmappingSource === "/idmap.parquet" && p.user === None)
    assert(p.roots === Seq("/ena/a", "/ena/b"))

    val ex = intercept[IllegalArgumentException](
      EnaMain.resolveArgs(Seq("--db-name", "efi")))
    assert(ex.getMessage.contains("--db-config is required"))
  }
}
