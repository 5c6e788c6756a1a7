package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class FreqItemsAggSpec extends AnyFunSuite with SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.collect().head.getSeq[Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("graft_freq_items: exact regime equals groupBy counts, err all zero") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    // 6 distinct items, capacity 10 -> no evictions anywhere: exact
    // counts, est DESC with item-ASC ties; repartition forces the
    // partial-merge path
    val items = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("c") ++
      Seq.fill(2)("d") ++ Seq("e", "f")
    val df = items.map(Tuple1(_)).toDF("t").repartition(4)
    val out = rows(df.agg(expr("graft_freq_items(t, 10)").as("fi")))
    assert(out === Seq(("a", 7L, 0L), ("b", 5L, 0L), ("c", 5L, 0L),
      ("d", 2L, 0L), ("e", 1L, 0L), ("f", 1L, 0L)))
    // nulls are ignored, not counted and not a throw
    val withNull = (items.map(Option(_)) :+ Option.empty[String])
      .map(Tuple1(_)).toDF("t").repartition(3)
    assert(rows(withNull.agg(expr("graft_freq_items(t, 10)").as("fi")))
      .map(_._1).toSet === Set("a", "b", "c", "d", "e", "f"))
  }

  test("graft_freq_items: eviction regime recovers planted heavy hitters within the bound") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    // 3 heavy items (1000/600/400) over 200 singleton light items,
    // capacity 20: n/capacity = 2200/20 = 110 < the 400-count floor of
    // the heavy set, so Space-Saving MUST surface all three with
    // est - err <= true <= est
    val heavy = Seq.fill(1000)("H1") ++ Seq.fill(600)("H2") ++ Seq.fill(400)("H3")
    val light = (0 until 200).map(i => f"light_$i%03d")
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(11))
      .shuffle(heavy ++ light).map(Tuple1(_)).toDF("t").repartition(4)
    val out = rows(df.agg(expr("graft_freq_items(t, 20)").as("fi")))
    assert(out.length === 20)
    val byItem = out.map(r => r._1 -> r).toMap
    val truth = Map("H1" -> 1000L, "H2" -> 600L, "H3" -> 400L)
    truth.foreach { case (k, n) =>
      val (_, est, err) = byItem.getOrElse(k, fail(s"$k missing from summary"))
      assert(est >= n && est - err <= n, s"$k: est=$est err=$err true=$n")
    }
    // the heavy three outrank every surviving light item
    assert(out.take(3).map(_._1).toSet === truth.keySet)
    // global Space-Saving bound: per-item error <= total stream length
    // divided by capacity (partials make it <= per-partial n/cap sums)
    assert(out.forall(_._3 <= 2200 / 20 * 4))
  }

  test("lazy-candidate eviction is victim-identical to the full-scan reference") {
    // the r13 amortized-O(1) eviction must choose EXACTLY the victims
    // the old O(capacity) content scan chose (lowest count, ties by
    // largest key) — randomized streams with heavy eviction pressure,
    // repeated keys (lazy-skip exercise), and several capacities
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(4242)
    for (cap <- Seq(2, 3, 8, 17); trial <- 0 until 20) {
      val agg = FreqItemsAgg(
        BoundReference(0, StringType, nullable = true), Literal(cap))
      val buf = agg.createAggregationBuffer()
      val ref = scala.collection.mutable.HashMap[String, (Long, Long)]()
      val nKeys = cap + 1 + rnd.nextInt(3 * cap)
      (0 until 400).foreach { _ =>
        val it = "k" + rnd.nextInt(nKeys)
        agg.update(buf, InternalRow(UTF8String.fromString(it)))
        ref.get(it) match {
          case Some((c, e)) => ref(it) = (c + 1, e)
          case None if ref.size < cap => ref(it) = (1L, 0L)
          case None =>
            var bestK: String = null; var bestC = Long.MaxValue
            ref.foreach { case (k, (c, _)) =>
              if (c < bestC ||
                  (c == bestC && (bestK == null || k.compareTo(bestK) > 0))) {
                bestK = k; bestC = c
              }
            }
            ref.remove(bestK); ref(it) = (bestC + 1, bestC)
        }
      }
      val got = buf.map { case (k, v) => k.toString -> ((v(0), v(1))) }.toMap
      assert(got == ref.toMap, s"cap=$cap trial=$trial")
    }
  }

  test("graft_freq_items: merge preserves true <= est when an item was evicted in one partial") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = FreqItemsAgg(BoundReference(0, StringType, nullable = true), Literal(2))
    def feed(items: String*): graft.functions.FreqItemsAgg.SsBuffer = {
      val buf = agg.createAggregationBuffer()
      items.foreach(i => agg.update(buf, InternalRow(UTF8String.fromString(i))))
      buf
    }
    // partial A holds h with 3; partial B saw h once but EVICTED it
    // (capacity 2, evict ties pick the largest item: c displaces h).
    // Pre-fix, merge left h at est=3 < true=4 — the broken upper bound.
    val a = feed("h", "h", "h", "a")
    val b = feed("h", "b", "c")
    assert(!b.contains(UTF8String.fromString("h")), "setup: h must be evicted from B")
    val merged = agg.merge(a, b)
    val h = merged(UTF8String.fromString("h"))
    assert(h(0) >= 4L, s"upper bound broken: est=${h(0)} < true=4")
    assert(h(0) - h(1) <= 4L, s"lower bound broken: est-err=${h(0) - h(1)} > true=4")
  }

  test("graft_freq_items: per-item bounds hold across random partials and merge orders") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 25) {
      val cap = 2 + rnd.nextInt(6)
      val agg = FreqItemsAgg(BoundReference(0, StringType, nullable = true), Literal(cap))
      // zipf-ish stream over a key space larger than capacity
      val stream = Seq.fill(300 + rnd.nextInt(300)) {
        val r = rnd.nextInt(100)
        if (r < 40) "k0" else if (r < 60) "k1" else s"k${2 + rnd.nextInt(30)}"
      }
      val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // split into 2..5 partials, update each, merge in a random fold order
      val nParts = 2 + rnd.nextInt(4)
      val partials = rnd.shuffle(stream).grouped(
        math.max(1, stream.size / nParts)).map { chunk =>
        val buf = agg.createAggregationBuffer()
        chunk.foreach(i => agg.update(buf, InternalRow(UTF8String.fromString(i))))
        buf
      }.toSeq
      val merged = rnd.shuffle(partials).reduce(agg.merge)
      merged.foreach { case (k, v) =>
        val est = v(0); val err = v(1)
        val t = truth.getOrElse(k.toString, 0L)
        assert(t <= est, s"trial $trial cap=$cap ${k.toString}: true=$t > est=$est")
        assert(est - err <= t,
          s"trial $trial cap=$cap ${k.toString}: est-err=${est - err} > true=$t")
      }
      // absent items are bounded by the kept minimum (saturated) or 0
      if (merged.size >= cap) {
        val minKept = merged.valuesIterator.map(_(0)).min
        truth.foreach { case (k, t) =>
          if (!merged.contains(UTF8String.fromString(k)))
            assert(t <= minKept, s"trial $trial absent $k: true=$t > minKept=$minKept")
        }
      }
    }
  }

  test("graft_freq_items: capacity must be a positive integral literal") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = Seq("x").map(Tuple1(_)).toDF("t")
    intercept[Exception](df.agg(expr("graft_freq_items(t, 0)")).collect())
    intercept[Exception](df.agg(expr("graft_freq_items(t, 'k')")).collect())
  }
}
