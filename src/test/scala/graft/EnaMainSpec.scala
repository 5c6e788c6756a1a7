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

  test("chooseBroadcastRegime probes a bounded number of rows, not a full scan") {
    val s = spark
    import s.implicits._
    val reads = s.sparkContext.longAccumulator("probe_reads")
    val big = s.range(1000000)
      .map { i => reads.add(1); (s"F$i", s"P$i") }
      .toDF("foreign_id", "uniprot_id")
    assert(!EnaMain.chooseBroadcastRegime(big, maxRows = 100))
    // LocalLimit stops each partition's iterator after limit rows: the
    // probe must touch ~(partitions x 101) rows, nowhere near the 1M a
    // full count() would read
    assert(reads.value < 10000, s"probe read ${reads.value} of 1000000 rows")
    val small = s.range(50).map(i => (s"F$i", s"P$i"))
      .toDF("foreign_id", "uniprot_id")
    assert(EnaMain.chooseBroadcastRegime(small, maxRows = 100))
  }

  test("chooseBroadcastRegime: wide ids under the row cap still force the shuffle regime") {
    val s = spark
    import s.implicits._
    // 50 rows (well under maxRows) but each uniprot_id is ~1 MiB: the
    // r6 row-only cap would have collected ~50 MiB+ to the driver; the
    // byte cap must refuse
    val wide = s.range(50).map(i => (s"F$i", "U" * (1 << 20)))
      .toDF("foreign_id", "uniprot_id")
    assert(!EnaMain.chooseBroadcastRegime(wide, maxRows = 100,
      maxBytes = 16L << 20))
    // same shape, byte budget comfortably above the estimate -> broadcast
    assert(EnaMain.chooseBroadcastRegime(wide, maxRows = 100,
      maxBytes = 1L << 30))
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
