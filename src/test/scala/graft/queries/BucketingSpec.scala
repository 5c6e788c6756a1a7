package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Co-located join via bucketing — the 100 TB recipe for repeated
  * fact-fact joins: both tables bucketed (and sorted) on the join key
  * at write time join with NO Exchange on either side, because the
  * bucket layout already satisfies the join's required distribution
  * (and the downstream groupBy on the same key rides the same layout).
  * The repeated-join savings is what pre-bucketing buys at scale.
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("persisted minhash index probes from the bucket layout, results unchanged") {
    val s = spark
    import s.implicits._
    val corpusDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines here"),
      (5L, "tiny")).toDF("doc_id", "text")
    val batch = Seq(
      (2L, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    try {
      val (b0, s0) = graft.llm.TextDedup.minhashIndex(corpusDocs)
      graft.llm.TextDedup.writeMinhashIndex(b0, s0,
        "mh_buckets", "mh_sets", numBuckets = 4)
      val (b1, s1) = graft.llm.TextDedup
        .readMinhashIndex(s, "mh_buckets", "mh_sets")
      val fromDisk = graft.llm.TextDedup.probeMinhashIndex(batch, b1, s1)
      // the corpus side scans its bucket layout: the table scan itself
      // reports as bucketed in the formatted plan
      val plan = fromDisk.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("Bucketed: true"), plan)
      // results identical to the in-memory probe
      val mem = graft.llm.TextDedup.probeMinhashIndex(batch, b0, s0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val disk = fromDisk
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(disk === mem)
    } finally {
      s.sql("DROP TABLE IF EXISTS mh_buckets")
      s.sql("DROP TABLE IF EXISTS mh_sets")
    }
  }

  test("persisted IVF index probes from the bucket layout, results unchanged") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    try {
      val (c0, f0) = graft.llm.Similarity.ivfTrain(emb, dims = 64)
      graft.llm.Similarity.writeIvfIndex(c0, f0,
        "ivf_cent", "ivf_cells", numBuckets = 4)
      val (c1, f1) = graft.llm.Similarity.readIvfIndex(s, "ivf_cent", "ivf_cells")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val fromDisk = graft.llm.Similarity.ivfProbe(c1, f1, queries, 2, 3)
      val plan = fromDisk.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("Bucketed: true"), plan)
      val mem = graft.llm.Similarity.ivfProbe(c0, f0, queries, 2, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val disk = fromDisk
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(disk === mem)

      // r12: the per-plan centroid memo keys on source mtime — an index
      // OVERWRITTEN IN PLACE must re-collect, not serve stale centroids.
      // Shrink the persisted cent table to one cell; a fresh probe must
      // route every query to that cell.
      val keepCell = c0.select(col("ccell")).collect().map(_.getInt(0)).min
      Thread.sleep(1100) // cover coarse-mtime filesystems
      c0.filter(col("ccell") === keepCell)
        .write.mode("overwrite").saveAsTable("ivf_cent")
      val (c2, f2) = graft.llm.Similarity.readIvfIndex(s, "ivf_cent", "ivf_cells")
      val cellsProbed = graft.llm.Similarity.ivfProbe(c2, f2, queries, 2, 3)
        .select(col("cell")).collect().map(_.getInt(0)).toSet
      assert(cellsProbed === Set(keepCell),
        s"stale centroid cache: probed $cellsProbed, index now has only $keepCell")
    } finally {
      s.sql("DROP TABLE IF EXISTS ivf_cent")
      s.sql("DROP TABLE IF EXISTS ivf_cells")
    }
  }

  test("bucketed fact-fact join runs without a shuffle on either side") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val sf = "/root/testdata/sf0.001"
      s.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      s.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // bucket layout satisfies both the join and the same-key groupBy:
      // no shuffle anywhere in the plan
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
