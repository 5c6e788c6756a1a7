package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Product quantization on a planted fixture where the right answer is
  * provable: every label's vectors sit EXACTLY on one point whose
  * coordinates are 3-decimal-exact, so the label-seeded codebook IS
  * those points (rounding is the identity), each vector must encode to
  * its own label's code in every subspace, and the ADC distance to a
  * corpus vector equals the plain squared L2 distance to its label
  * point. The q134 oracle gates the real-corpus arithmetic; this spec
  * pins the MECHANICS (codebook shape, encode argmin, reconstruction)
  * on inputs where approximation error is exactly zero.
  */
class PqSpec extends AnyFunSuite with SparkSpec {

  private val dims = 8
  private val m = 2

  // 4 labels at 4 well-separated points; 3 identical vectors per label
  private def point(l: Int): Seq[Float] =
    (0 until dims).map(j => (l * 10.0 + j * 0.125).toFloat)

  private def fixture = {
    val s = spark
    import s.implicits._
    val rows = for {
      l <- 0 until 4
      c <- 0 until 3
    } yield (l.toLong * 3 + c, point(l), l)
    rows.toDF("vec_id", "embedding", "label")
  }

  test("label-seeded codebooks reproduce the planted points exactly") {
    val cb = Similarity.pqTrain(fixture, dims, m).collect()
    assert(cb.length === m * 4)
    cb.foreach { r =>
      val (sub, code, cv) = (r.getInt(0), r.getInt(1), r.getSeq[Double](2))
      val expect = point(code).slice(sub * 4, sub * 4 + 4).map(_.toDouble)
      assert(cv === expect, s"sub=$sub code=$code")
    }
  }

  test("every vector encodes to its own label's code in every subspace") {
    val cb = Similarity.pqTrain(fixture, dims, m)
    val enc = Similarity.pqEncode(fixture.repartition(5), cb, dims, m)
      .join(fixture.select(col("vec_id"), col("label")), "vec_id")
      .collect()
    assert(enc.length === 12)
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes === Seq.fill(m)(r.getInt(2)),
        s"vec ${r.getLong(0)} codes $codes")
    }
  }

  test("ADC distance equals exact distance-to-label-point on the planted corpus") {
    val out = Similarity.pqTopK(fixture, dims, m, nQueries = 2, k = 11)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(2)), (r.getLong(1), r.getDouble(3))))
      .toMap
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) *
        (x.toDouble - y.toDouble) }.sum
    for (q <- 0 until 2; x <- 0 until 12; if x != q) {
      val expect = d2(point(q / 3), point(x / 3))
      val (_, adist) = out((q.toLong, x.toLong))
      assert(math.abs(adist - expect) < 1e-9, s"q=$q x=$x")
    }
    // same-label corpus vectors (zero reconstruction distance) rank
    // first, ties by vec_id — the (score, id) heap order
    val first = out.collect { case ((q, x), (rnk, _)) if rnk == 1 => (q, x) }
    assert(first.toSet === Set((0L, 1L), (1L, 0L)))
  }

  test("encode is invariant under partitioning") {
    val cb = Similarity.pqTrain(fixture, dims, m)
    val a = Similarity.pqEncode(fixture.repartition(1), cb, dims, m)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val b = Similarity.pqEncode(fixture.repartition(7), cb, dims, m)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(a === b)
  }

  test("uneven dims/m is a clean failure") {
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(fixture, dims = 8, m = 3)
    }
  }

  // ---- IVF-PQ composition (q135's mechanics) ----

  test("ivfPq with nProbe = nCells reproduces plain PQ exactly") {
    // cells partition the corpus, so probing all of them makes the
    // candidate set identical to pqTopK's — same heap, same order,
    // bit-identical distances
    val key = (r: Row) => (r.getLong(0), r.getLong(1))
    val a = Similarity.pqTopK(fixture, dims, m, nQueries = 3, k = 4)
      .collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    val b = Similarity.ivfPqTopK(fixture, dims, m, nProbe = 4,
        nQueries = 3, k = 4)
      .collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(a === b)
  }

  test("ivfPq with nProbe = 1 searches only the query's own cell") {
    // each label's vectors sit on one point, so IVF cells ARE the
    // labels and a 1-probe search must return only same-label
    // neighbors (self excluded): exactly the 2 co-located vectors
    val out = Similarity.ivfPqTopK(fixture, dims, m, nProbe = 1,
      nQueries = 6, k = 11).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 6L).toSet)
    byQ.foreach { case (q, rows) =>
      val label = q / 3
      val expect = (0 until 3).map(c => label * 3 + c).filter(_ != q).toSet
      assert(rows.map(_.getLong(2)).toSet === expect, s"q=$q")
      rows.foreach(r => assert(r.getDouble(3) === 0.0))
    }
  }

  test("ivfPq is invariant under partitioning") {
    val key = (r: Row) => (r.getLong(0), r.getLong(1))
    val a = Similarity.ivfPqTopK(
        fixture.repartition(1), dims, m, nProbe = 2, nQueries = 4, k = 5)
      .collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    val b = Similarity.ivfPqTopK(
        fixture.repartition(7), dims, m, nProbe = 2, nQueries = 4, k = 5)
      .collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(a === b)
  }
}
