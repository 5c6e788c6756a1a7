package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The session-keyed base-table memo: same relation back per (session,
  * path), and context-end eviction so long-lived multi-session JVMs
  * don't pin stopped sessions forever.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  test("memoizes per (session, path) and evicts on context end") {
    val dir = "/root/testdata/sf0.001"
    val a = Tables.parquet(spark, s"$dir/region.parquet")
    val b = Tables.parquet(spark, s"$dir/region.parquet")
    assert(a eq b, "same session+path must return the memoized relation")
    assert(Tables.cachedEntriesFor(spark) >= 1)
    // a second session on the same context gets its own entry
    val s2 = spark.newSession()
    val c = Tables.parquet(s2, s"$dir/region.parquet")
    assert(!(c eq a))
    assert(Tables.cachedEntriesFor(s2) === 1)
    // context end drops every session keyed to that context (the
    // listener delegates here; posting a real ApplicationEnd would
    // tear down the suite's shared session)
    Tables.evict(spark.sparkContext)
    assert(Tables.cachedEntriesFor(spark) === 0)
    assert(Tables.cachedEntriesFor(s2) === 0)
    // and the memo refills transparently afterwards
    assert(Tables.parquet(spark, s"$dir/region.parquet").count() === 5L)
  }
}
