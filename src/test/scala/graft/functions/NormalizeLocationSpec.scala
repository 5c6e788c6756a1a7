package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** SQL-surface coverage for the native K1 expression (the pure-Scala
  * kernel behind it carries the 24 golden cases in CoordsSpec).
  */
class NormalizeLocationSpec extends AnyFunSuite with SparkSpec {

  private def sql1(q: String) = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(q).head()
  }

  test("linear: (min, max) over endpoints") {
    val r = sql1(
      """SELECT normalize_location(array(12L, 134L), array(78L, 202L), 1, 478325L) AS x"""
    ).getStruct(0)
    assert((r.getLong(0), r.getLong(1)) === (12L, 202L))
  }

  test("circular wraparound: start > end encodes origin span") {
    // the reference's golden circ_spans_boundary case:
    // ranges [(900,1000),(1,70)] on a 1000 bp circular chromosome
    val r = sql1(
      """SELECT normalize_location(array(900L, 1L), array(1000L, 70L), 0, 1000L) AS x"""
    ).getStruct(0)
    assert((r.getLong(0), r.getLong(1)) === (900L, 70L))
  }

  test("empty ranges -> null (SQL semantics, not an exception)") {
    val row = sql1(
      """SELECT normalize_location(CAST(array() AS ARRAY<BIGINT>),
        |                          CAST(array() AS ARRAY<BIGINT>), 1, 100L) AS x""".stripMargin)
    assert(row.isNullAt(0))
  }

  test("compiles inside whole-stage codegen over a real column") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.range(1, 50)
      .selectExpr(
        "normalize_location(array(id, id + 100L), array(id + 10L, id + 150L), 0, 1000L) AS loc")
      .selectExpr("loc.start AS s", "loc.`end` AS e")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("normalize_location"), plan)
    assert(plan.contains("*(1)"), s"expected codegen stage:\n$plan")
    assert(df.count() === 49)
  }
}
