package graft.embl

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Generative properties for the circular/linear coordinate kernel
  * (reference semantics: `ena_build/parse_embl.py:364-441`; the 24
  * ported golden cases live in [[CoordsSpec]]). The kernel is pure
  * Scala, so properties run hundreds of cases at unit-test cost —
  * this guards the exact `gap > max_gap` tie semantics
  * (parse_embl.py:423) that silently corrupt output if regressed.
  */
class CoordsPropertySpec extends AnyFunSuite {

  private def assertHolds(p: Prop, cases: Int = 200): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, r.status.toString)
  }

  // --------------------------------------------------------------- linear

  private val endpoint = Gen.chooseNum(1L, 1000L)
  private val arbitraryRanges = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.zip(endpoint, endpoint)))

  test("property: linear normalization is exactly (min, max) over all endpoints") {
    val p = Prop.forAll(arbitraryRanges,
      Gen.oneOf(1, -1, 2, 7)) { (ranges, struct) =>
      val (lo, hi) = Coords.normalizeLocation(ranges, struct, 2000L)
      val eps = ranges.flatMap { case (a, b) => Seq(a, b) }
      lo == eps.min && hi == eps.max
    }
    assertHolds(p)
  }

  // ------------------------------------------------------------- circular

  /** A well-formed circular arrangement: k arcs with pairwise-DISTINCT
    * gaps between them (distinctness makes the max gap unique, so the
    * normalized result is a single well-defined physical arc — no
    * tie-dependence). Realized on a circle of length
    * L = Σ lens + Σ gaps.
    */
  private val arrangement = for {
    k <- Gen.chooseNum(1, 6)
    lens <- Gen.listOfN(k, Gen.chooseNum(1L, 20L))
    gaps <- Gen.pick(k, 1L to 60L) // distinct => unique max gap
  } yield (lens, gaps.toList)

  /** Lay the arcs on the circle starting at 1-based `offset`; None if
    * any arc would cross the origin (the (lo, hi) encoding cannot
    * represent a split arc as INPUT — only the output encodes wrap).
    */
  private def realize(
      lens: List[Long], gaps: List[Long], offset: Long
  ): Option[(Seq[(Long, Long)], Long)] = {
    val total = lens.sum + gaps.sum
    var pos = offset
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    lens.zip(gaps).foreach { case (len, gap) =>
      val start = ((pos - 1) % total) + 1
      val end = start + len - 1
      if (end > total) return None // arc would cross the origin
      out += ((start, end))
      pos = start + len + gap
    }
    Some((out.toSeq, total))
  }

  test("property: circular result endpoints come from the input ranges") {
    val p = Prop.forAll(arrangement, Gen.chooseNum(0L, 500L)) {
      case ((lens, gaps), rawOff) =>
        val total = lens.sum + gaps.sum
        realize(lens, gaps, 1L + rawOff % total) match {
          case None => Prop.undecided
          case Some((ranges, l)) =>
            val (lo, hi) = Coords.normalizeLocation(ranges, 0, l)
            Prop(ranges.exists(_._1 == lo) && ranges.exists(_._2 == hi))
        }
    }
    assertHolds(p)
  }

  test("property: circular normalization is rotation-invariant (unique gaps)") {
    // shifting the origin by r maps position p to ((p-1+r) mod L)+1;
    // with a UNIQUE max gap the normalized span is the same physical
    // arc, so the result must rotate with the input
    val p = Prop.forAll(arrangement, Gen.chooseNum(0L, 500L)) {
      case ((lens, gaps), rawR) =>
        (realize(lens, gaps, 1L), realize(lens, gaps, 1L + rawR % (lens.sum + gaps.sum))) match {
          case (Some((base, l)), Some((rotated, _))) =>
            val r = rawR % l
            def rot(pos: Long): Long = ((pos - 1 + r) % l) + 1
            val (lo0, hi0) = Coords.normalizeLocation(base, 0, l)
            // input order must not matter either: feed the rotated
            // arrangement reversed
            val (loR, hiR) = Coords.normalizeLocation(rotated.reverse, 0, l)
            Prop(loR == rot(lo0) && hiR == rot(hi0))
          case _ => Prop.undecided
        }
    }
    assertHolds(p)
  }

  test("property: a single circular range normalizes to itself") {
    val p = Prop.forAll(Gen.chooseNum(1L, 100L), Gen.chooseNum(0L, 100L),
      Gen.chooseNum(1L, 200L)) { (lo, lenM1, slack) =>
      val hi = lo + lenM1
      val l = hi + slack
      Coords.normalizeLocation(Seq((lo, hi)), 0, l) == ((lo, hi))
    }
    assertHolds(p)
  }

  test("property: when no interior gap beats the wrap gap, span is (first.lo, last.hi)") {
    // ties favor the wrap gap (STRICT > at parse_embl.py:423): whenever
    // every interior gap is <= the wrap gap the gene does NOT wrap
    val p = Prop.forAll(arrangement, Gen.chooseNum(0L, 500L)) {
      case ((lens, gaps), rawOff) =>
        val total = lens.sum + gaps.sum
        realize(lens, gaps, 1L + rawOff % total) match {
          case None => Prop.undecided
          case Some((ranges, l)) =>
            val sorted = ranges.sortBy(_._1)
            val wrapGap = (l - sorted.last._2) + (sorted.head._1 - 1)
            val interior = sorted.sliding(2).collect {
              case Seq(a, b) => b._1 - a._2 - 1
            }.toSeq
            val (lo, hi) = Coords.normalizeLocation(ranges, 0, l)
            if (interior.forall(_ <= wrapGap))
              Prop(lo == sorted.head._1 && hi == sorted.last._2 && lo <= hi)
            else Prop(lo > hi) // wrapped: start > end encodes wraparound
        }
    }
    assertHolds(p)
  }
}
