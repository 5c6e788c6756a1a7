// Scratch generator (r18, VERDICT r17 next-round #8): an sf10 slice —
// ONLY the tables the candidate-density-superlinear operators read
// (documents, embeddings, orders) at 10x sf1 — so those operators'
// volume evidence stretches another decade without paying a DuckDB
// oracle that would take hours at this size (Sf10Spot asserts growth
// and replica-independence invariants instead of hashes).
//
// Construction (the GenSf1 conventions, one decade up):
//  - documents: the dup-rate-preserving token-suffix replication —
//    every token gets a per-replica suffix, so replicas are 10
//    independent gram universes (no cross-replica shingle, LSH
//    bucket, or component can form except by 31-bit hash coincidence)
//    and each replica's internal dup structure is exactly sf1's;
//  - embeddings: per-replica WALSH SIGN MASKS — replica r negates
//    dimension d iff popcount(d & r) is odd. Negation patterns are
//    isometries, so every intra-replica cosine/distance is EXACTLY
//    sf1's (q80's per-replica behavior is preserved to the bit),
//    while any cross-replica pair sees the balanced mask M_{r xor s}
//    (dims = 64 = all 6-bit patterns, so exactly half the signs
//    flip), scattering cross-replica cosines toward 0 — replicas are
//    near-independent universes for ANN/dedup candidate generation;
//  - orders: key offsets with dates/priorities untouched — 10
//    independent interval populations over the same date range.
// Output: /tmp/graft_sf10/<table>.parquet (Spark directory layout).
// Run: sbt -batch "runMain graft.GenSf10"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object GenSf10 {
  val Root = "/tmp/graft_sf10"
  val K = 10000000000L // doc/vec/order key offset per replica

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = args.headOption.getOrElse("/tmp/graft_sf1")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame, parts: Int = 64): Unit = {
      val out = s"$Root/$t.parquet"
      // skip only on Spark's _SUCCESS marker, not bare existence — a
      // directory left by a crashed run would otherwise be certified as
      // a complete table on the next run (r19 ADVICE); mode("overwrite")
      // replaces any partial remnant
      if (new java.io.File(out, "_SUCCESS").exists()) {
        println(s"GENSF10 skip $t"); return
      }
      df.repartition(parts).write.mode("overwrite").parquet(out)
      println(s"GENSF10 wrote $t")
    }
    def replicate(t: String, f: (DataFrame, Int) => DataFrame,
        parts: Int = 64): Unit = {
      val base = read(t)
      write(t, (0 until 10).map(rep => f(base, rep)).reduce(_ unionByName _),
        parts)
    }

    replicate("documents", (d, rep) => d.select(
      (col("doc_id") + lit(rep * K)).as("doc_id"),
      (if (rep == 0) col("text")
       else concat_ws(" ", transform(split(col("text"), " "),
         x => concat(x, lit(s"~$rep"))))).as("text"),
      col("lang"), col("source")).withColumn(
      "n_chars", length(col("text")).cast("long")))

    replicate("embeddings", (e, rep) => {
      if (rep == 0) e
      else e.select(
        (col("vec_id") + lit(rep * K)).as("vec_id"),
        transform(col("embedding"), (v, d) =>
          // Walsh sign: negate dim d iff popcount(d & rep) is odd
          when(bit_count(d.bitwiseAND(lit(rep))) % 2 === 1, -v)
            .otherwise(v)).as("embedding"),
        col("label"))
    })

    replicate("orders", (o, rep) => o.select(
      (col("o_orderkey") + lit(rep * K)).as("o_orderkey"),
      (col("o_custkey") + lit(rep * K)).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))

    spark.stop()
  }
}
