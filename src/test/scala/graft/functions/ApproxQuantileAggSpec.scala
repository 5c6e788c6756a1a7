package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ApproxQuantileAggSpec extends AnyFunSuite with SparkSpec {

  private def q(df: org.apache.spark.sql.DataFrame, expr0: String): Double =
    df.agg(expr(expr0)).collect().head.getDouble(0)

  test("graft_approx_quantile: small inputs are exact (all samples retained)") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(_.toDouble).map(Tuple1(_)).toDF("v")
      .repartition(4)
    // n=100 < k=2048: no compaction ever fires, rank ⌈p·n⌉ is exact
    assert(q(df, "graft_approx_quantile(v, 0.5, 2048)") === 50.0)
    assert(q(df, "graft_approx_quantile(v, 0.0, 2048)") === 1.0)
    assert(q(df, "graft_approx_quantile(v, 1.0, 2048)") === 100.0)
    assert(q(df, "graft_approx_quantile(v, 0.25, 2048)") === 25.0)
  }

  test("graft_approx_quantile: nulls skipped; all-null group yields null") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = (Seq[Option[Double]](Some(1.0), None, Some(3.0), None))
      .map(Tuple1(_)).toDF("v").repartition(2)
    assert(q(df, "graft_approx_quantile(v, 1.0, 64)") === 3.0)
    val allNull = Seq[Option[Double]](None, None).map(Tuple1(_)).toDF("v")
    assert(allNull.agg(expr("graft_approx_quantile(v, 0.5, 64)"))
      .collect().head.isNullAt(0))
  }

  test("graft_approx_quantile: rank error within the KLL bound on uniform, " +
      "zipf-skewed, and adversarially sorted streams") {
    GraftFunctions.ensureRegistered(spark)
    // 400k rows, k=2048: published KLL 99%-confidence rank error for
    // this k is ~0.3%; gate at 0.5% normalized rank error (the
    // deterministic coin behaves like the random one on these shapes)
    val n = 400000L
    val shapes = Seq(
      // uniform-ish via multiplicative hash
      ("uniform", (pmod(col("id") * 2654435761L, lit(1000003L))).cast("double")),
      // heavy-skew: ~rank^-1 tail
      ("zipf", pow(greatest(
        crc32(col("id").cast("string")).cast("double") / 4294967296.0,
        lit(1e-9)), lit(-1.0))),
      // sorted input: the classic sketch-adversarial arrival order
      ("sorted", col("id").cast("double")))
    shapes.foreach { case (name, vcol) =>
      val df = spark.range(n).select(vcol.as("v")).repartition(8)
      val approx = q(df, "graft_approx_quantile(v, 0.5, 2048)")
      // true rank of the returned value
      val below = df.filter(col("v") <= approx).count()
      val rankErr = math.abs(below - n * 0.5) / n.toDouble
      info(f"$name: normalized rank error $rankErr%.5f")
      assert(rankErr < 0.005, f"$name rank error $rankErr%.5f >= 0.5%%")
    }
  }

  test("graft_approx_quantile: merge of partials keeps weight exact and " +
      "error bounded across random splits") {
    // FreqItemsAggSpec-style direct-buffer property test: 40 trials of
    // random stream splits, merged in random order — total weight must
    // equal n EXACTLY after every merge (the conservation invariant
    // the odd-size compaction exists for), and the median of the
    // merged sketch must stay within 1% normalized rank of true
    val rnd = new scala.util.Random(7)
    (1 to 40).foreach { trial =>
      val n = 5000 + rnd.nextInt(45000)
      val data = Array.fill(n)(rnd.nextDouble() * 1e6)
      val nParts = 1 + rnd.nextInt(7)
      val bufs = Array.fill(nParts)(
        new ApproxQuantileAgg.KllBuffer(256))
      data.zipWithIndex.foreach { case (v, i) =>
        bufs(i % nParts).add(v)
      }
      val order = rnd.shuffle((1 until nParts).toList)
      val acc = bufs(0)
      order.foreach(i => acc.mergeIn(bufs(i)))
      var w = 0L
      (0 until acc.numLevels).foreach { h =>
        w += acc.sizes(h).toLong << h
      }
      assert(w === n.toLong, s"trial $trial: weight $w != n $n")
      val med = acc.quantile(0.5)
      val below = data.count(_ <= med)
      val rankErr = math.abs(below - n * 0.5) / n.toDouble
      assert(rankErr < 0.01, f"trial $trial: merged rank error $rankErr%.4f")
    }
  }

  test("graft_approx_quantile: bounded state — levels total O(k) doubles " +
      "at 1M inputs") {
    val buf = new ApproxQuantileAgg.KllBuffer(512)
    var i = 0
    while (i < 1000000) { buf.add(i.toDouble); i += 1 }
    val retained = (0 until buf.numLevels).map(buf.sizes(_)).sum
    // geometric capacities: Σ k·(2/3)^d < 3k, plus per-level odd
    // leftovers and the in-flight level-0 buffer
    assert(retained < 3 * 512 + buf.numLevels + 512,
      s"retained $retained doubles — state not O(k)")
    assert(buf.numLevels < 24)
  }

  test("graft_approx_quantile: literal-argument type checks") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = Seq(1.0).map(Tuple1(_)).toDF("v")
    val bad = Seq(
      "graft_approx_quantile(v, v, 64)", // non-literal percentage
      "graft_approx_quantile(v, 1.5, 64)", // p out of range
      "graft_approx_quantile(v, 0.5, 4)") // k too small
    bad.foreach { e =>
      intercept[Exception](df.agg(expr(e)).collect())
    }
  }
}
