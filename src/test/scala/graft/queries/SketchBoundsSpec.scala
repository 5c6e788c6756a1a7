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
