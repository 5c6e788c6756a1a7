// Scratch diagnostic (r15, VERDICT r14 #2): per-stage attribution of
// q125's cost — the lone >2x paired row. The fixture is sf-independent
// (a generated 2M-row planted-gap stream), so the floor is the same at
// every bench point: where does the time go between stream generation,
// the exact-count twin, and the Space-Saving sketch's update/eviction
// path? Run: sbt -batch "runMain graft.Q125Decomp"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Q125Decomp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val n = 2000000L
    val m = 8192
    def stream = {
      val b = col("id") % 100
      val blk = expr("id div 100")
      val tok = when(b < 20 && blk < lit(20000) - lit(1000) * b,
          concat(lit("h"), lpad(b.cast("string"), 2, "0")))
        .otherwise(concat(lit("t"),
          ((blk * 80 + (b - 20)) % 400000).cast("string")))
      spark.range(n).select(tok.as("token"))
    }

    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q125DECOMP $tag best=${ts.min}%.3f " +
        s"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      ts.min
    }

    best3("stream_gen")(stream)
    best3("exact_counts")(stream.groupBy(col("token"))
      .agg(count(lit(1)).as("n")))
    best3("exact_top20")(stream.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20))
    // the sketch alone, eviction regime (capacity 8192 << 400k distinct)
    best3("sketch_evict")(stream
      .agg(expr(s"graft_freq_items(token, $m)").as("fi")))
    // partition ladder: partial UPDATE work is constant, the final
    // single-thread MERGE chain grows with partition count — if p1
    // (no merge) is fast and p32 slow, the merge path is the floor
    def streamP(p: Int) = {
      val b = col("id") % 100
      val blk = expr("id div 100")
      val tok = when(b < 20 && blk < lit(20000) - lit(1000) * b,
          concat(lit("h"), lpad(b.cast("string"), 2, "0")))
        .otherwise(concat(lit("t"),
          ((blk * 80 + (b - 20)) % 400000).cast("string")))
      spark.range(0, n, 1, p).select(tok.as("token"))
    }
    best3("sketch_evict_p1")(streamP(1)
      .agg(expr(s"graft_freq_items(token, $m)").as("fi")))
    best3("sketch_evict_p4")(streamP(4)
      .agg(expr(s"graft_freq_items(token, $m)").as("fi")))
    // no-eviction control: capacity above the distinct count isolates
    // the eviction machinery from the hash-update floor
    best3("sketch_exact_500k")(stream
      .agg(expr("graft_freq_items(token, 500000)").as("fi")))
    // update floor control: same rows, all-hit (20 distinct keys only)
    best3("sketch_allhit")(spark.range(n)
      .select(concat(lit("h"), (col("id") % 20).cast("string")).as("token"))
      .agg(expr(s"graft_freq_items(token, $m)").as("fi")))
    best3("full_q125")(graft.SparkEntry
      .queries("q125_freq_items_eviction")(spark, "/root/testdata/sf0.1"))
    spark.stop()
  }
}
