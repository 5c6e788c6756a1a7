package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Semantics pins for the round-6 curation additions: segment-level
  * dedup (C4 line-dedup analog), BM25 retrieval, familiarity
  * bucketing, and int8 embedding quantization. Value-level oracle
  * parity is hash-checked by the driver (q84–q87); these fix the
  * operator semantics on hand-built micro-inputs.
  */
class CurationOpsSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("segmentDedup: global first occurrence keeps, docs reassemble in order") {
    val out = TextDedup.segmentDedup(docs(
      1L -> "a b c d",
      2L -> "a b x y", // first segment duplicates doc 1's
      3L -> "c d c d", // both segments duplicate doc 1's tail
      4L -> "z z z z", // within-doc repeat: second occurrence drops
      5L -> ""         // zero tokens → one empty segment
    ), width = 2).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((2L, 2L, "a b c d")))
    assert(out(2L) === ((2L, 1L, "x y")))
    assert(out(3L) === ((2L, 0L, "")))
    assert(out(4L) === ((2L, 1L, "z z")))
    assert(out(5L) === ((1L, 1L, "")))
  }

  test("bm25Rank: term-bearing docs only, ranked by score desc") {
    val out = TextAnalysis.bm25Rank(docs(
      1L -> "spark merge spark",
      2L -> "spark alpha beta gamma delta epsilon zeta eta",
      3L -> "nothing relevant here"),
      terms = Seq("merge", "spark"), topK = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a > b })
    assert(scores.forall(_ > 0))
  }

  test("familiarityBuckets: equal-depth, ordered, non-overlapping ranges") {
    val corpus = docs(
      1L -> "the cat sat", 2L -> "the cat ran", 3L -> "the dog sat",
      4L -> "a bird flew", 5L -> "the cat sat", 6L -> "odd words only")
    val out = TextAnalysis.familiarityBuckets(corpus, n = 3).collect()
    assert(out.map(_.getAs[Int]("bucket")).toSeq === Seq(1, 2, 3))
    assert(out.map(_.getAs[Long]("n_docs")).sum === 6L)
    // bucket k's range sits at or below bucket k+1's
    out.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Double]("max_familiarity")
        <= hi.getAs[Double]("min_familiarity") + 1e-12)
    }
  }

  test("quantizeInt8: exact codes, checksum, and reconstruction error") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Seq(0.0f, 1.0f, 0.5f)),
      (2L, Seq(2.0f, 2.0f))) // constant vector: span 0 → code 0, err 0
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("code_sum"), r.getAs[Double]("recon_err"))).toMap
    // codes: 0, 255, floor(0.5*255 + 0.5) = 128
    assert(out(1L)._1 === 383L)
    val expectedErr = math.pow(0.5 - 128.0 * 1.0 / 255.0, 2)
    assert(math.abs(out(1L)._2 - expectedErr) < 1e-15)
    assert(out(2L) === ((0L, 0.0)))
  }
}
