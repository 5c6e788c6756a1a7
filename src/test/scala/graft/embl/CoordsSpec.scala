package graft.embl

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's 24 golden coordinate-normalization cases
  * (tests/location_parsing_test.py:17-119; chromosome_length = 1000,
  * linear = 1, circular = 0), plus seeded property checks.
  */
class CoordsSpec extends AnyFunSuite {
  private val Lin = 1
  private val Circ = 0
  private val Len = 1000L

  private val cases: Seq[(String, Seq[(Long, Long)], Int, (Long, Long))] = Seq(
    ("lin_simple", Seq((1L, 700L)), Lin, (1L, 700L)),
    ("circ_simple", Seq((1L, 700L)), Circ, (1L, 700L)),
    ("lin_simple_join", Seq((1L, 100L), (100L, 202L)), Lin, (1L, 202L)),
    ("circ_simple_join", Seq((1L, 100L), (100L, 202L)), Circ, (1L, 202L)),
    ("lin_unsorted_join", Seq((491L, 516L), (269L, 457L)), Lin, (269L, 516L)),
    ("circ_unsorted_join", Seq((491L, 516L), (269L, 457L)), Circ, (269L, 516L)),
    ("lin_many_joins", Seq((491L, 516L), (110L, 220L), (269L, 457L), (518L, 600L)), Lin, (110L, 600L)),
    ("circ_many_joins", Seq((491L, 516L), (110L, 220L), (269L, 457L), (518L, 600L)), Circ, (110L, 600L)),
    ("lin_full_cov", Seq((1L, 1000L)), Lin, (1L, 1000L)),
    ("circ_full_cov", Seq((1L, 1000L)), Circ, (1L, 1000L)),
    ("lin_join_full_cov", Seq((1L, 500L), (501L, 1000L)), Lin, (1L, 1000L)),
    ("circ_join_full_cov", Seq((1L, 500L), (501L, 1000L)), Circ, (1L, 1000L)),
    ("lin_spans_boundary", Seq((1L, 70L), (900L, 1000L)), Lin, (1L, 1000L)),
    ("circ_spans_boundary", Seq((1L, 70L), (900L, 1000L)), Circ, (900L, 70L)),
    ("lin_skip_start", Seq((25L, 70L), (900L, 1000L)), Lin, (25L, 1000L)),
    ("circ_skip_start", Seq((25L, 70L), (900L, 1000L)), Circ, (900L, 70L)),
    ("lin_skip_end", Seq((1L, 70L), (900L, 999L)), Lin, (1L, 999L)),
    ("circ_skip_end", Seq((1L, 70L), (900L, 999L)), Circ, (900L, 70L)),
    ("lin_skip_termini", Seq((25L, 70L), (900L, 999L)), Lin, (25L, 999L)),
    ("circ_skip_termini", Seq((25L, 70L), (900L, 999L)), Circ, (900L, 70L)),
    ("lin_gap=1", Seq((1L, 500L), (502L, 1000L)), Lin, (1L, 1000L)),
    ("circ_gap=1", Seq((1L, 500L), (502L, 1000L)), Circ, (502L, 500L)),
    ("lin_equiv_gaps", Seq((100L, 199L), (300L, 399L), (500L, 599L), (700L, 799L), (900L, 999L)), Lin, (100L, 999L)),
    ("circ_equiv_gaps", Seq((100L, 199L), (300L, 399L), (500L, 599L), (700L, 799L), (900L, 999L)), Circ, (100L, 999L)),
    ("lin_equiv_gaps_2", Seq((99L, 199L), (300L, 399L), (500L, 599L), (700L, 799L), (900L, 999L)), Lin, (99L, 999L)),
    ("circ_equiv_gaps_2", Seq((99L, 199L), (300L, 399L), (500L, 599L), (700L, 799L), (900L, 999L)), Circ, (300L, 199L)),
  )

  cases.foreach { case (name, ranges, struct, expected) =>
    test(s"golden: $name") {
      assert(Coords.normalizeLocation(ranges, struct, Len) === expected)
    }
  }

  private def randomRanges(rnd: scala.util.Random): Seq[(Long, Long)] = {
    val n = 1 + rnd.nextInt(8)
    Seq.fill(n) {
      val a = 1L + rnd.nextInt(Len.toInt)
      val b = a + rnd.nextInt((Len - a + 1).toInt)
      (a, b)
    }
  }

  test("property: linear result is (min, max) of all endpoints") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val rs = randomRanges(rnd)
      val flat = rs.flatMap(t => Seq(t._1, t._2))
      assert(Coords.normalizeLocation(rs, Lin, Len) === ((flat.min, flat.max)))
    }
  }

  test("property: circular result endpoints come from the input endpoints") {
    val rnd = new scala.util.Random(43)
    (1 to 500).foreach { _ =>
      val rs = randomRanges(rnd)
      val los = rs.map(_._1).toSet
      val his = rs.map(_._2).toSet
      val (s, e) = Coords.normalizeLocation(rs, Circ, Len)
      assert(los.contains(s) && his.contains(e))
    }
  }

  test("property: circular with a single range behaves linearly") {
    val rnd = new scala.util.Random(44)
    (1 to 500).foreach { _ =>
      val a = 1L + rnd.nextInt(Len.toInt)
      val b = a + rnd.nextInt((Len - a + 1).toInt)
      assert(Coords.normalizeLocation(Seq((a, b)), Circ, Len) === ((a, b)))
    }
  }
}
