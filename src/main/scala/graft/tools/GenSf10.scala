// Scratch generator. r18 (VERDICT r17 #8) built an sf10 slice — only
// the tables the candidate-density-superlinear operators read
// (documents, embeddings, orders) — for Sf10Spot's growth/independence
// invariants. r19 (VERDICT r18 #1) extends it to EVERY driver table so
// the FULL 155-query oracle + paired bench can run at sf10: the
// dual-regime thresholds that never flip at bench scales (count-map
// caps, the LM model bound, union-find probes, MaxDriverEdges, the ENA
// broadcast byte cap) flip naturally at this volume, putting the
// distributed forms under oracle gating without the FORCE switch.
// Oracles DuckDB cannot finish inside the ORACLE_TIMEOUT_SEC budget
// are recorded as engine wins (see scripts/check_oracle.py).
//
// Construction (the GenSf1 conventions, one decade up — keys offset
// rep*K with referential integrity preserved, exactly as GenSf1):
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

    // r19: the remaining driver tables. Dims copy verbatim (TPC-H
    // holds them fixed); fact/dim keys shift by rep*K with referential
    // integrity preserved (lineitem's order/part/supp keys shift with
    // their parents', matching orders' o_custkey shift above, so joins
    // see 10 independent sf1 universes). sf1 key offsets top out below
    // 10^10, so rep*K never collides across replicas.
    write("region", read("region"), parts = 1)
    write("nation", read("nation"), parts = 1)
    replicate("customer", (d, rep) => d.select(
      (col("c_custkey") + lit(rep * K)).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"),
      col("c_mktsegment")), parts = 16)
    replicate("supplier", (d, rep) => d.select(
      (col("s_suppkey") + lit(rep * K)).as("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal")), parts = 4)
    replicate("part", (d, rep) => d.select(
      (col("p_partkey") + lit(rep * K)).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), parts = 16)
    replicate("lineitem", (d, rep) => d.select(
      (col("l_orderkey") + lit(rep * K)).as("l_orderkey"),
      (col("l_partkey") + lit(rep * K)).as("l_partkey"),
      (col("l_suppkey") + lit(rep * K)).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), parts = 64)
    // events replicate per-user over the same month (10 independent
    // user populations — the GenSf1 stance); K is safely above sf1's
    // 9e9+ event/user id ceiling
    replicate("events", (d, rep) => d.select(
      (col("event_id") + lit(rep * K)).as("event_id"),
      col("ts"),
      (col("user_id") + lit(rep * K)).as("user_id"),
      col("event_type"), col("value"), col("props")), parts = 64)

    // row-count report (the GenSf1 convention)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      println(s"GENSF10 $t rows=" +
        spark.read.parquet(s"$Root/$t.parquet").count())
    }
    spark.stop()
  }
}
