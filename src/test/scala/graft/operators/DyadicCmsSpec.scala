package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.{CountMinAgg, GraftFunctions}

class DyadicCmsSpec extends AnyFunSuite with SparkSpec {

  private def grid(values: Seq[Long], levels: Int, width: Int,
      depth: Int): Array[Byte] = {
    val s = spark
    import s.implicits._
    val keys = values.toDF("v").select(explode(array(
      (0 until levels).map(l => graft.llm.TextFns.hash60(
        concat(lit(s"$l|"), shiftright(col("v"), l).cast("string")))): _*))
      .as("k"))
    keys.agg(call_function(GraftFunctions.CmsAggName,
      col("k"), lit(width), lit(depth)).as("g"))
      .collect()(0).getAs[Array[Byte]]("g")
  }

  test("rankEstimates: est_rank >= exact_rank everywhere; exact at " +
      "collision-free width") {
    val s = spark
    import s.implicits._
    val rnd = new java.util.Random(7)
    val values = Seq.fill(2000)(math.abs(rnd.nextLong()) % 1000L)
    val df = values.toDF("n_chars")
    val probes = Seq(0L, 1L, 63L, 100L, 250L, 500L, 750L, 999L, 1023L)
    val out = DyadicCms.rankEstimates(df, "n_chars", probes,
      levels = 10, width = 65536, depth = 4)
      .orderBy(col("p")).collect()
    assert(out.length === probes.length)
    out.foreach { r =>
      val p = r.getAs[Long]("p")
      val exact = r.getAs[Long]("exact_rank")
      val est = r.getAs[Long]("est_rank")
      assert(exact === values.count(_ < p).toLong, s"exact at p=$p")
      assert(est >= exact, s"never undercounts at p=$p")
      // 10 levels x 2000 values = 20k insertions into 4x65536 buckets:
      // a colliding pair in all 4 rows is ~impossible; the estimate
      // should be EXACT here (any slack is real collision mass, which
      // a 3-sigma-style allowance would hide — assert tight instead)
      assert(est === exact, s"collision-free width must be exact at p=$p")
    }
  }

  test("rank error stays within the CMS bound at a lossy width") {
    val s = spark
    import s.implicits._
    val rnd = new java.util.Random(11)
    val n = 5000
    val values = Seq.fill(n)(math.abs(rnd.nextLong()) % 4096L)
    val levels = 12
    val width = 1024 // deliberately lossy: levels*n / width ~ 59 per row
    val out = DyadicCms.rankEstimates(values.toDF("n_chars"), "n_chars",
      Seq(256L, 1024L, 2048L, 3000L, 4095L), levels, width, depth = 4)
      .collect()
    out.foreach { r =>
      val est = r.getAs[Long]("est_rank")
      val exact = r.getAs[Long]("exact_rank")
      assert(est >= exact)
      // eps = e/width per queried node, levels nodes max, N' = levels*n
      // inserted mass; allow 3x the expectation for the min-of-depth
      val bound = (3.0 * levels * math.E * levels * n / width).toLong
      assert(est - exact <= bound,
        s"overcount ${est - exact} exceeds loose CMS bound $bound")
    }
  }

  test("quantiles: returned value's exact rank brackets the target " +
      "within the sketch's additive error") {
    val rnd = new java.util.Random(3)
    val n = 10000
    val values = Seq.fill(n)(math.abs(rnd.nextLong()) % 2048L)
    val levels = 11
    val g = grid(values, levels, width = 65536, depth = 4)
    val sorted = values.sorted
    DyadicCms.quantiles(g, n, Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
        levels).foreach { case (q, v, estRank) =>
      val target = math.ceil(q * n).toLong
      val exactRankAtV = sorted.count(_ < v).toLong
      val exactRankPastV = sorted.count(_ <= v).toLong
      // collision-free grid: the descent is exact — the value's rank
      // interval [rank(v), rank(v+1)) must contain the target
      assert(exactRankAtV < target && target <= exactRankPastV,
        s"q=$q returned v=$v ranks [$exactRankAtV, $exactRankPastV] " +
          s"vs target $target")
      assert(estRank === exactRankAtV, s"estRank at q=$q")
    }
  }

  test("quantiles: a stale n or a levels mismatch fails loudly " +
      "against the grid's own mass (r16 ADVICE)") {
    val values = Seq.fill(500)(7L)
    val levels = 10
    val g = grid(values, levels, width = 1024, depth = 4)
    // correct (n, levels) passes
    assert(DyadicCms.quantiles(g, 500L, Seq(0.5), levels).nonEmpty)
    // wrong n: the grid's row mass is 500*levels, not 499*levels
    val e1 = intercept[IllegalArgumentException](
      DyadicCms.quantiles(g, 499L, Seq(0.5), levels))
    assert(e1.getMessage.contains("grid mass"))
    // wrong levels: built at 10, queried at 12
    val e2 = intercept[IllegalArgumentException](
      DyadicCms.quantiles(g, 500L, Seq(0.5), 12))
    assert(e2.getMessage.contains("grid mass"))
  }

  test("the grid merges: two half-corpus grids sum to the full grid " +
      "bit for bit") {
    val rnd = new java.util.Random(5)
    val all = Seq.fill(3000)(math.abs(rnd.nextLong()) % 1024L)
    val (a, b) = all.splitAt(1500)
    val levels = 10
    val ga = CountMinAgg.fromBytes(grid(a, levels, 1024, 4))
    val gb = CountMinAgg.fromBytes(grid(b, levels, 1024, 4))
    val gAll = grid(all, levels, 1024, 4)
    val merged = CountMinAgg.toBytes(CountMinAgg.sum(ga, gb, "spec"))
    assert(java.util.Arrays.equals(merged, gAll),
      "dyadic grids must merge losslessly (CMS sum)")
  }

  test("out-of-range values error loudly instead of folding into " +
      "wrong nodes") {
    val s = spark
    import s.implicits._
    val df = Seq(5L, 100L, 5000L).toDF("n_chars") // 5000 >= 2^12
    val ex = intercept[Exception] {
      DyadicCms.rankEstimates(df, "n_chars", Seq(64L),
        levels = 12, width = 1024, depth = 4).collect()
    }
    assert(ex.getMessage != null)
  }
}
