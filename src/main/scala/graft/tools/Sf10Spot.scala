// Scratch certification (r18, VERDICT r17 next-round #8): the five
// operators whose cost is superlinear in CANDIDATE DENSITY — LSH pair
// generation (q30), connected components over those pairs (q61), the
// interval join (q58), semantic dedup (q80), and the increment gate's
// contamination/familiarity kernel (q146) — run at sf1 AND sf10 (10x)
// on the GenSf10 slice, asserting the evidence a DuckDB hash compare
// can't affordably give at this volume:
//
//  - GROWTH: warm best-of-2 wall time grows ≤ GrowthCap (default 20,
//    i.e. ≤ 2x over linear for a 10x volume step) — a quadratic
//    candidate explosion would blow straight through it;
//  - INDEPENDENCE: the token-suffix construction makes replicas
//    disjoint gram universes, so q30 pairs and q61 dup-component rows
//    must grow EXACTLY 10x (a cross-replica pair would mean candidate
//    generation leaked outside its buckets); q80's Walsh-mask isometry
//    preserves every intra-replica distance, so its drop-set also
//    grows exactly 10x unless cross-replica candidates appear AND
//    survive the exact rerank.
//
// Prints one JSON line per operator + a PASS/FAIL summary; nonzero
// exit on any violation. Run:
//   sbt -batch "runMain graft.Sf10Spot [sf1Dir] [sf10Dir]"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object Sf10Spot {
  val GrowthCap = 20.0

  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf10 = args.drop(1).headOption.getOrElse(GenSf10.Root)
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val ops = Seq("q30_minhash_lsh_pairs", "q61_dup_components",
      "q58_interval_join", "q80_semantic_dedup", "q146_increment_flagship")
    // replicas are independent universes: these outputs must scale 10x
    // EXACTLY (see header); q58/q146 emit fixed-grain or threshold-cut
    // rows where exact 10x is not structural, so growth-only there
    val exact10x = Set("q30_minhash_lsh_pairs", "q61_dup_components")

    def run(name: String, dir: String): (Long, Double) = {
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        val n = SparkEntry.queries(name)(spark, dir).count()
        graft.operators.Checkpoints.releaseLeaked(spark)
        (n, secs)
      }
      once() // warm
      val (n1, t1) = once()
      val (n2, t2) = once()
      assert(n1 == n2, s"$name nondeterministic row count: $n1 vs $n2")
      (n1, math.min(t1, t2))
    }

    var failed = List.empty[String]
    ops.foreach { name =>
      val (rows1, t1) = run(name, sf1)
      val (rows10, t10) = run(name, sf10)
      val growth = t10 / t1
      val rowRatio = rows10.toDouble / rows1
      val okGrowth = growth <= GrowthCap
      val okRows =
        if (exact10x(name)) rows10 == 10 * rows1
        else rows10 >= rows1 // monotone sanity
      if (!okGrowth) failed ::= s"$name growth ${f"$growth%.1f"}x > $GrowthCap"
      if (!okRows) failed ::= s"$name rows $rows1 -> $rows10 " +
        s"(expected ${if (exact10x(name)) "exactly 10x" else ">= sf1"})"
      println(f"""SF10SPOT {"op":"$name","rows_sf1":$rows1,"rows_sf10":$rows10,"row_ratio":$rowRatio%.3f,"sec_sf1":$t1%.3f,"sec_sf10":$t10%.3f,"growth":$growth%.2f,"ok":${okGrowth && okRows}}""")
    }
    if (failed.nonEmpty) {
      failed.foreach(f => System.err.println(s"SF10SPOT FAIL: $f"))
      spark.stop(); sys.exit(1)
    }
    println("SF10SPOT PASS: all five density-superlinear operators " +
      s"within ${GrowthCap}x growth at 10x volume, replica invariants hold")
    spark.stop()
  }
}
