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

  test("graft_freq_items: capacity must be a positive integral literal") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = Seq("x").map(Tuple1(_)).toDF("t")
    intercept[Exception](df.agg(expr("graft_freq_items(t, 0)")).collect())
    intercept[Exception](df.agg(expr("graft_freq_items(t, 'k')")).collect())
  }
}
