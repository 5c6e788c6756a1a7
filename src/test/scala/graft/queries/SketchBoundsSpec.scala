package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The approx-sketch bound check at a SECOND scale factor: q49's
  * oracle hash-checks the within-rsd flags at the driver's sf0.01;
  * this pins them at sf0.001 too, so the bands aren't tuned to one
  * dataset. (The flags compare HLL++ / GK-sketch results to their
  * exact twins computed in the same query — see QueryPackExt.q49.)
  */
class SketchBoundsSpec extends AnyFunSuite with SparkSpec {

  test("q49: sketches stay inside their rsd bands against exact twins") {
    val rows = QueryPackExt.queries("q49_approx_sketches")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"parts_ok false for ${r.getString(0)}")
      assert(r.getBoolean(4), s"supps_ok false for ${r.getString(0)}")
      assert(r.getBoolean(5), s"median_ok false for ${r.getString(0)}")
    }
  }

  test("q49: fused and branched forms agree on NULL-bearing keys") {
    // SQL count(DISTINCT c) skips NULLs; both forms must share that
    // semantics so the file-size probe can never flip the answer on a
    // null-heavy input (ADVICE r13). Exact expectation: rf=A has
    // partkeys {1,2} (NULLs dropped), suppkeys {7}; rf=B {3}, {8,9}.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("l_returnflag", StringType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_extendedprice", DoubleType)))
    val rows = Seq(
      Row("A", 1L, 7L, 10.0), Row("A", 2L, null, 20.0),
      Row("A", null, 7L, 30.0), Row("A", null, null, 40.0),
      Row("B", 3L, 8L, 50.0), Row("B", 3L, 9L, 60.0),
      Row("B", null, 9L, 70.0))
    val li = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    def key(r: Row) = r.getString(0)
    val fused = QueryPackExt.q49Fused(li).collect()
      .map(r => key(r) -> r.toSeq).toMap
    val branched = QueryPackExt.q49Branched(li).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(fused === branched)
    assert(fused("A")(1) === 2L && fused("A")(2) === 1L)
    assert(fused("B")(1) === 1L && fused("B")(2) === 2L)
  }

  test("q53: merged and single-pass HLL sketches stay inside the band") {
    val rows = QueryPackExt.queries("q53_hll_mergeable")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"merged_within_band false for ${r.getString(0)}")
      assert(r.getBoolean(3), s"single_within_band false for ${r.getString(0)}")
    }
  }
}
