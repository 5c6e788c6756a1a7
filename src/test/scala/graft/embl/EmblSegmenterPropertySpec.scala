package graft.embl

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Generative control-flow properties for the EMBL segmentation state
  * machine (reference `ena_build/parse_embl.py:444-570`): the golden
  * specs pin known inputs; these pin the INVARIANTS — noise lines
  * never matter, file splits at record boundaries never matter,
  * tombstoned or taxonomy-killed records vanish without disturbing
  * their neighbors. `segment` is a pure iterator transform, so
  * hundreds of cases run at unit-test cost.
  */
class EmblSegmenterPropertySpec extends AnyFunSuite {

  private def assertHolds(p: Prop, cases: Int = 100): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, r.status.toString)
  }

  // ------------------------------------------------------ record model

  private case class Block(isCds: Boolean, ranges: Seq[(Long, Long)],
      uniprots: Seq[String], proteins: Seq[String])
  private case class Rec(acc: String, circular: Boolean, len: Long,
      blocks: Seq[Block])

  private val accGen = for {
    n <- Gen.chooseNum(4, 10)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield "A" + cs.mkString

  private val blockGen = for {
    isCds <- Gen.oneOf(true, true, false) // CDS-biased
    k <- Gen.chooseNum(1, 3)
    ranges <- Gen.listOfN(k, for {
      lo <- Gen.chooseNum(1L, 800L)
      w <- Gen.chooseNum(0L, 150L)
    } yield (lo, lo + w))
    nu <- Gen.chooseNum(0, 2)
    np <- Gen.chooseNum(0, 2)
    us <- Gen.listOfN(nu, accGen.map("U" + _))
    ps <- Gen.listOfN(np, accGen.map("P" + _))
  } yield Block(isCds, ranges, us.distinct, ps.distinct)

  private val recGen = for {
    acc <- accGen
    circ <- Gen.oneOf(true, false)
    len <- Gen.chooseNum(1000L, 5000L)
    nb <- Gen.chooseNum(0, 4)
    blocks <- Gen.listOfN(nb, blockGen)
  } yield Rec(acc, circ, len, blocks)

  private val corpusGen = Gen.chooseNum(1, 6).flatMap(Gen.listOfN(_, recGen))
    .suchThat(rs => rs.map(_.acc).distinct.size == rs.size)

  // ------------------------------------------------------- rendering

  private def render(r: Rec): Seq[String] = {
    val struct = if (r.circular) "circular" else "linear"
    val id = s"ID   ${r.acc}; SV 1; $struct; genomic DNA; STD; PRO; ${r.len} BP."
    val body = r.blocks.flatMap { b =>
      val key = if (b.isCds) "CDS" else "gene"
      val loc = b.ranges.map { case (lo, hi) => s"$lo..$hi" }.mkString(",")
      val locLine =
        s"FT   $key             " +
          (if (b.ranges.size > 1) s"join($loc)" else loc)
      val quals =
        b.uniprots.map(u =>
          "FT                   /db_xref=\"UniProtKB/Swiss-Prot:" + u + "\"") ++
        b.proteins.map(p =>
          "FT                   /protein_id=\"" + p + ".1\"")
      locLine +: quals
    }
    id +: body
  }

  /** The model's expectation: one locus per CDS block, in order. */
  private def expected(r: Rec, path: String): Seq[LocusRow] =
    r.blocks.filter(_.isCds).zipWithIndex.map { case (b, i) =>
      val (s, e) = Coords.normalizeLocation(
        b.ranges, if (r.circular) 0 else 1, r.len)
      LocusRow(path, r.acc, if (r.circular) 0 else 1, r.len, i + 1,
        direction = 1, s, e, b.uniprots, b.proteins.map(_ + ".1"))
    }

  private def run(lines: Seq[(String, String)]): Seq[LocusRow] =
    EmblSegmenter.segment(lines.iterator).toSeq

  // ------------------------------------------------------- properties

  test("property: well-formed corpora emit exactly the per-CDS model loci") {
    val p = Prop.forAll(corpusGen) { rs =>
      val lines = rs.flatMap(render).map(("f", _))
      run(lines) == rs.flatMap(expected(_, "f"))
    }
    assertHolds(p)
  }

  test("property: non-FT/ID/OC noise lines never change the output") {
    val noise = Gen.oneOf("", "XX", "AC   X56734;",
      "SQ   Sequence 1000 BP;", "     aacgt aacgt", "DE   something")
    val p = Prop.forAll(corpusGen, Gen.listOf(Gen.zip(
      Gen.chooseNum(0, 1000), noise))) { (rs, inserts) =>
      val base = rs.flatMap(render)
      val noisy = inserts.foldLeft(base) { case (acc, (pos, n)) =>
        val i = pos % (acc.size + 1)
        (acc.take(i) :+ n) ++ acc.drop(i)
      }
      run(noisy.map(("f", _))) == run(base.map(("f", _)))
    }
    assertHolds(p)
  }

  test("property: a file split at any record boundary is invisible (modulo path)") {
    val p = Prop.forAll(corpusGen, Gen.chooseNum(0, 100)) { (rs, cut0) =>
      val cut = cut0 % (rs.size + 1)
      val (a, b) = rs.splitAt(cut)
      val split = a.flatMap(render).map(("f1", _)) ++
        b.flatMap(render).map(("f2", _))
      val one = rs.flatMap(render).map(("f", _))
      run(split).map(_.copy(file_path = "f")) == run(one)
    }
    assertHolds(p)
  }

  test("property: malformed ID tombstones a record; neighbors are untouched") {
    val p = Prop.forAll(corpusGen, Gen.chooseNum(0, 100)) { (rs, pick0) =>
      val pick = pick0 % rs.size
      val lines = rs.zipWithIndex.flatMap { case (r, i) =>
        val rendered = render(r)
        if (i == pick) "ID   ???? malformed" +: rendered.tail else rendered
      }.map(("f", _))
      val want = rs.zipWithIndex
        .filter(_._2 != pick)
        .flatMap { case (r, _) => expected(r, "f") }
      run(lines) == want
    }
    assertHolds(p)
  }

  test("property: a Eukaryota OC line kills exactly that record (Fungi survive)") {
    val p = Prop.forAll(corpusGen, Gen.chooseNum(0, 100),
      Gen.oneOf(true, false)) { (rs, pick0, fungal) =>
      val pick = pick0 % rs.size
      val oc = if (fungal) "OC   Eukaryota; Fungi; Dikarya."
               else "OC   Eukaryota; Metazoa; Chordata."
      val lines = rs.zipWithIndex.flatMap { case (r, i) =>
        val rendered = render(r)
        // OC arrives right after the ID line, as in real EMBL layouts
        if (i == pick) rendered.head +: oc +: rendered.tail else rendered
      }.map(("f", _))
      val want = rs.zipWithIndex
        .filter { case (_, i) => i != pick || fungal }
        .flatMap { case (r, _) => expected(r, "f") }
      run(lines) == want
    }
    assertHolds(p)
  }
}
