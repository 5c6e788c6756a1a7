package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class EnaMainSpec extends AnyFunSuite with SparkSpec {

  test("readIdmapping: parquet snapshot projects (foreign_id, uniprot_id)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("idmap").toString + "/idmapping.parquet"
    Seq(("AAA1.1", "P10001", "extra"))
      .toDF("foreign_id", "uniprot_id", "unrelated")
      .write.parquet(dir)
    val got = EnaMain.readIdmapping(spark, dir)
    assert(got.columns.toSeq === Seq("foreign_id", "uniprot_id"))
    assert(got.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("AAA1.1", "P10001")))
  }

  test("readIdmapping: jdbc URLs dispatch to the JDBC reader") {
    // no database is reachable in this environment; the dispatch itself
    // (format + fail-fast on connect) is the testable boundary
    val e = intercept[Exception] {
      EnaMain.readIdmapping(spark, "jdbc:mysql://nonexistent:3306/db").collect()
    }
    assert(e.getMessage != null)
  }
}
