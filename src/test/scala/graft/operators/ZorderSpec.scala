package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ZorderSpec extends AnyFunSuite with SparkSpec {

  /** Reference Morton interleave: the naive bit loop the mask cascade
    * must equal.
    */
  private def mortonRef(x: Long, y: Long): Long = {
    val cx = math.max(0L, math.min(x, (1L << 31) - 1))
    val cy = math.max(0L, math.min(y, (1L << 31) - 1))
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((cx >> i) & 1L) << (2 * i)
      z |= ((cy >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zkey equals the naive bit interleave, including clamp edges") {
    val s = spark
    import s.implicits._
    val rnd = new java.util.Random(42)
    val cases = Seq.tabulate(300)(_ =>
      (rnd.nextLong() % (1L << 32), rnd.nextLong() % (1L << 32))) ++
      Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 31) - 1, (1L << 31) - 1),
        (-5L, 7L), (Long.MaxValue, 3L), (3L, Long.MaxValue))
    val df = cases.toDF("x", "y")
      .withColumn("z", Zorder.zkey(col("x"), col("y")))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z === mortonRef(x, y), s"zkey($x, $y)")
      assert(z >= 0, "Morton codes must stay sign-safe")
    }
  }

  test("zkey is monotone per axis with the other axis fixed") {
    // a pruning key must preserve each dimension's order within a
    // fixed other-coordinate — that is what makes min/max footprints
    // axis-tight
    val xs = Seq(0L, 1L, 2L, 100L, 65535L, 1L << 20, (1L << 31) - 1)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(mortonRef(a, 77L) < mortonRef(b, 77L))
      assert(mortonRef(77L, a) < mortonRef(77L, b))
    }
  }

  test("zorderBy tightens per-file footprints in BOTH dimensions vs a single-column sort") {
    val s = spark
    import s.implicits._
    // a grid where the two dims are independent: single-column sort
    // leaves dim-2 spanning the full domain in every file
    val n = 4096
    val rnd = new java.util.Random(7)
    val rows = Seq.tabulate(n)(_ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("a", "b")
    val parts = 16

    // per-output-partition min/max span of each dim, averaged,
    // normalized by the domain — directly proportional to the
    // expected fraction of files a point/range predicate must read
    def meanSpans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = laid
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa").as("ma"), avg("sb").as("mb"))
        .collect()(0)
      (spans.getDouble(0) / 1024.0, spans.getDouble(1) / 1024.0)
    }

    val naive = df.repartitionByRange(parts, col("a"))
      .sortWithinPartitions(col("a"))
    val z = Zorder.zorderBy(df, "a", "b", parts)
    val (na, nb) = meanSpans(naive)
    val (za, zb) = meanSpans(z)
    // naive: dim a tight, dim b spans ~everything
    assert(na < 0.2, s"naive a-span $na")
    assert(nb > 0.8, s"naive b-span $nb")
    // z-order: BOTH dims substantially tighter than the naive b-span;
    // 16 partitions on a 2-D curve → expected span ~1/4 per dim
    assert(za < 0.6 && zb < 0.6, s"zorder spans ($za, $zb)")
    // and the layout is a rewrite, not a transformation: same rows
    assert(z.collect().toSet === df.collect().toSet)
  }

  test("zorderBy: NULLs land in the sentinel bucket, nothing is dropped") {
    val s = spark
    import s.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(5L), Some(5L)), (None, Some(3L)), (Some(2L), None),
      (None, None)).toDF("a", "b")
    val z = Zorder.zorderBy(df, "a", "b", 2)
    assert(z.count() === 4)
  }

  test("end-to-end: a z-ordered parquet write prunes the scan on the SECOND dimension") {
    // closes the loop from layout to scan benefit (r15 verdict #6):
    // write both layouts as real parquet (one row group per output
    // partition — at that granularity row-group skipping IS file
    // skipping: pruned files contribute footer reads only, no data
    // pages), scan with a pushed min/max predicate on dim b, and
    // count the rows the scan actually materialized. Sorted-by-a
    // leaves b spanning the full domain in every file, so a b-range
    // predicate must read EVERYTHING; the z-layout's axis-tight
    // footprints skip most of the curve.
    val s = spark
    import s.implicits._
    val n = 4096
    val rnd = new java.util.Random(11)
    val df = Seq.tabulate(n)(_ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)).toDF("a", "b")
    val parts = 16
    val root = java.nio.file.Files
      .createTempDirectory("graft_zorder_e2e_").toString
    df.repartitionByRange(parts, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(s"$root/by_a")
    Zorder.zorderBy(df, "a", "b", parts).write.parquet(s"$root/zorder")

    // rows the SCAN emitted (post row-group/page skip, pre any
    // residual filter) — the read-efficiency measure the layout buys
    def rowsRead(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("b") >= 100L && col("b") <= 163L)
      assert(q.queryExecution.executedPlan.toString.contains(
        "PushedFilters: [IsNotNull(b), GreaterThanOrEqual(b,100)"),
        "the b-range predicate must reach the parquet scan")
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val naiveRead = rowsRead(s"$root/by_a")
    val zRead = rowsRead(s"$root/zorder")
    // identical result set from both layouts
    assert(spark.read.parquet(s"$root/by_a")
        .filter(col("b").between(100L, 163L)).collect().toSet ===
      spark.read.parquet(s"$root/zorder")
        .filter(col("b").between(100L, 163L)).collect().toSet)
    assert(naiveRead === n.toLong,
      s"sort-by-a cannot prune a b predicate (read $naiveRead)")
    // 16 partitions on the curve = a 4x4 grid: a 64/1024 b-slab
    // intersects one grid row -> ~4 of 16 files; allow slack for
    // uneven range splits
    assert(zRead <= n / 2,
      s"z-layout must skip most files on the b predicate (read $zRead)")
  }

  /** Reference d-dim Morton interleave: the naive bit loop every mask
    * cascade must equal (bit i of dim j at position i·d + j).
    */
  private def mortonRefN(vs: Seq[Long]): Long = {
    val d = vs.length
    val bits = Zorder.bitsFor(d)
    val cl = vs.map(v => math.max(0L, math.min(v, (1L << bits) - 1)))
    var z = 0L
    for (j <- 0 until d; i <- 0 until bits)
      z |= ((cl(j) >> i) & 1L) << (i * d + j)
    z
  }

  test("zkeyN equals the naive interleave for d = 3 and 4, incl clamp edges") {
    val s = spark
    import s.implicits._
    val rnd = new java.util.Random(43)
    for (d <- Seq(3, 4)) {
      val bits = Zorder.bitsFor(d)
      val cases = Seq.tabulate(300)(_ =>
        Seq.fill(d)(rnd.nextLong() % (1L << (bits + 2)))) ++ Seq(
        Seq.fill(d)(0L), Seq.fill(d)((1L << bits) - 1),
        Seq.tabulate(d)(_.toLong), Seq.fill(d)(-9L),
        Seq.fill(d)(Long.MaxValue))
      val df = cases.map(vs => Tuple1(vs)).toDF("vs")
        .withColumn("z", Zorder.zkeyN(
          (0 until d).map(i => element_at(col("vs"), i + 1))))
      df.select(col("vs"), col("z")).collect().foreach { r =>
        val vs = r.getSeq[Long](0)
        val z = r.getLong(1)
        assert(z === mortonRefN(vs), s"zkeyN(d=$d, $vs)")
        assert(z >= 0, "Morton codes must stay sign-safe")
      }
    }
  }

  test("zkeyN is monotone per axis with the others fixed, d = 3 and 4") {
    for (d <- Seq(3, 4)) {
      val bits = Zorder.bitsFor(d)
      val xs = Seq(0L, 1L, 2L, 100L, 1L << (bits / 2), (1L << bits) - 1)
      for (axis <- 0 until d) {
        xs.sliding(2).foreach { case Seq(a, b) =>
          def key(v: Long) = mortonRefN(Seq.tabulate(d)(j =>
            if (j == axis) v else 77L))
          assert(key(a) < key(b), s"d=$d axis=$axis: $a vs $b")
        }
      }
    }
  }

  test("zorderByN tightens per-file footprints in ALL THREE dimensions") {
    val s = spark
    import s.implicits._
    // independent dims: a 1-D sort leaves the other two spanning the
    // full domain in every file; the 3-D curve bounds all three
    val n = 8192
    val rnd = new java.util.Random(17)
    val df = Seq.tabulate(n)(_ => (rnd.nextInt(512).toLong,
      rnd.nextInt(512).toLong, rnd.nextInt(512).toLong)).toDF("a", "b", "c")
    val parts = 64 // a 4x4x4 grid on the curve
    def meanSpans(laid: org.apache.spark.sql.DataFrame): Seq[Double] = {
      val r = laid.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"),
          (max("c") - min("c")).as("sc"))
        .agg(avg("sa"), avg("sb"), avg("sc")).collect()(0)
      (0 until 3).map(i => r.getDouble(i) / 512.0)
    }
    val naive = df.repartitionByRange(parts, col("a"))
      .sortWithinPartitions(col("a"))
    val z = Zorder.zorderByN(df, Seq("a", "b", "c"), parts)
    val ns = meanSpans(naive)
    val zs = meanSpans(z)
    assert(ns(0) < 0.1, s"naive a-span ${ns(0)}")
    assert(ns(1) > 0.8 && ns(2) > 0.8, s"naive b/c spans $ns")
    // 64 partitions on a 3-D curve -> expected span ~1/4 per dim;
    // allow slack for uneven range splits
    zs.foreach(sp => assert(sp < 0.6, s"zorder spans $zs"))
    assert(z.collect().toSet === df.collect().toSet)
  }

  test("zorderByN: a NULL in any of the three key columns lands in the sentinel bucket") {
    val s = spark
    import s.implicits._
    val df = Seq[(Option[Long], Option[Long], Option[Long])](
      (Some(5L), Some(5L), Some(1L)), (None, Some(3L), Some(2L)),
      (Some(2L), None, None), (None, None, None)).toDF("a", "b", "c")
    assert(Zorder.zorderByN(df, Seq("a", "b", "c"), 2).count() === 4)
  }
}
