package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke the driver contract: `entry` must return rows > 0 and every
  * registered query must have either an oracle or a documented reason.
  */
class FlagshipSpec extends AnyFunSuite with SparkSpec {

  test("SparkEntry.entry returns a non-empty flagship relation") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.length === 8) // 7-column schema + file_path
    assert(df.count() > 0)
  }

  test("SparkEntry.queries is wired (round-1 regression guard)") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.oracleSql.nonEmpty)
    // every oracle key must name a registered query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
