// Scratch diagnostic (r14): per-branch attribution of q49's cost at
// bench config — which of the four branched stages floors the query
// now that the quantile sketch is the native KLL aggregate.
// Run: sbt -batch "runMain graft.Q49Decomp"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Q49Decomp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q49DECOMP $tag best=${ts.min}%.3f " +
        s"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      ts.min
    }

    best3("sketch_kll")(li.groupBy(col("l_returnflag"))
      .agg(expr("graft_approx_quantile(l_extendedprice, 0.5, 2048)")
        .as("approx_median")))
    best3("sketch_gk_old")(li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
        .as("approx_median")))
    best3("exact_median_single")(graft.operators.Percentiles
      .groupedExact(li, "l_returnflag", "l_extendedprice", Seq(0.5),
        twoPhaseThreshold = Long.MaxValue))
    best3("exact_median_twophase")(graft.operators.Percentiles
      .groupedExact(li, "l_returnflag", "l_extendedprice", Seq(0.5),
        twoPhaseThreshold = 0L))
    best3("distinct_parts")(
      li.filter(col("l_partkey").isNotNull)
        .groupBy(col("l_returnflag"), col("l_partkey")).agg(count(lit(1)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts")))
    best3("distinct_supps")(
      li.filter(col("l_suppkey").isNotNull)
        .groupBy(col("l_returnflag"), col("l_suppkey")).agg(count(lit(1)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_supps"),
          approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps")))
    best3("supps_rsd05")(
      li.filter(col("l_suppkey").isNotNull)
        .groupBy(col("l_returnflag"), col("l_suppkey")).agg(count(lit(1)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_supps"),
          approx_count_distinct(col("l_suppkey"), 0.05).as("approx_supps")))
    best3("parts_rsd01")(
      li.filter(col("l_partkey").isNotNull)
        .groupBy(col("l_returnflag"), col("l_partkey")).agg(count(lit(1)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts")))
    best3("supps_exact_only")(
      li.filter(col("l_suppkey").isNotNull)
        .groupBy(col("l_returnflag"), col("l_suppkey")).agg(count(lit(1)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_supps")))
    best3("supps_group1")(
      li.filter(col("l_suppkey").isNotNull)
        .groupBy(col("l_returnflag"), col("l_suppkey"))
        .agg(count(lit(1))))
    best3("supps_datasketches14")(
      li.filter(col("l_suppkey").isNotNull)
        .groupBy(col("l_returnflag"), col("l_suppkey")).agg(count(lit(1)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_supps"),
          hll_sketch_estimate(hll_sketch_agg(col("l_suppkey"), lit(14)))
            .as("approx_supps")))
    // accuracy probe: estimates vs exact at both rsd targets
    val acc = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("exact_s"),
        hll_sketch_estimate(hll_sketch_agg(col("l_suppkey"), lit(14)))
          .as("hll_s"),
        countDistinct(col("l_partkey")).as("exact_p"),
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12)))
          .as("hll_p"))
      .collect()
    acc.foreach { r =>
      println(s"Q49DECOMP acc rf=${r.get(0)} supps=${r.getLong(1)}/${r.getLong(2)} " +
        s"parts=${r.getLong(3)}/${r.getLong(4)}")
    }
    best3("agg_count_only")(li.groupBy(col("l_returnflag"))
      .agg(count(lit(1))))
    best3("agg_exact_distinct2")(li.groupBy(col("l_returnflag"))
      .agg(expr("graft_exact_distinct(l_partkey)"),
        expr("graft_exact_distinct(l_suppkey)")))
    best3("agg_hll2")(li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12))),
        hll_sketch_estimate(hll_sketch_agg(col("l_suppkey"), lit(14)))))
    best3("agg_exact_pct")(li.groupBy(col("l_returnflag"))
      .agg(expr("graft_exact_percentile(l_extendedprice, 0.5)")))
    best3("agg_kll")(li.groupBy(col("l_returnflag"))
      .agg(expr("graft_approx_quantile(l_extendedprice, 0.5, 2048)")))
    best3("branched_full")(graft.queries.QueryPackExt.q49Branched(li))
    best3("fused_full")(graft.queries.QueryPackExt.q49Fused(li))

    // planning-only attribution: how much of a run is driver-side
    // plan building + codegen vs executed work
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val qe = graft.queries.QueryPackExt.q49Branched(li).queryExecution
      val _ = qe.executedPlan
      val tPlan = (System.nanoTime() - t0) / 1e9
      println(f"Q49DECOMP plan_only_$i=$tPlan%.3f")
    }
    // execution via collect (no noop-writer framing)
    val dfB = graft.queries.QueryPackExt.q49Branched(li)
    dfB.collect()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.queries.QueryPackExt.q49Branched(li).collect()
      println(f"Q49DECOMP collect_$i=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    // harness-shaped: fan-out exchange like Bench, check pruning + time
    spark.conf.set("spark.graft.harness.fanOutSmallScans", "true")
    val liF = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .repartition(32)
    println(graft.queries.QueryPackExt.q49Branched(liF)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("Exchange") ||
        l.contains("Aggregate")).mkString("\n"))
    best3("branched_fanout")(graft.queries.QueryPackExt.q49Branched(liF))
    spark.stop()
  }
}
