// Scratch measurement entry: 10x scale curves for the round-7/8
// operators BASELINE.md did not yet cover — HNSW build+probe (the
// shard-graph memory and probe fan-out curves), DSIR importance
// selection, the histogram exact percentiles, and the video container
// parse (per-row, expected flat per row).
// Run: sbt -batch "runMain graft.Sf1xR8"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Sf1xR8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    // NOTE: no releaseLeaked inside the loop — the HNSW section keeps a
    // deliberately pinned index alive across timed probes; sections
    // sweep for themselves when their pins are dead
    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SF1XR8 $tag best=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    // --- HNSW: build + probe at 2k and 20k vectors
    for ((tag, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1", "10x" -> "/tmp/sf1x")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      best3(s"hnsw_build_$tag")(
        graft.llm.Hnsw.hnswIndex(emb.repartition(8), m = 8, efConstruction = 64))
      val idx = graft.llm.Hnsw.hnswIndex(emb.repartition(8), m = 8,
        efConstruction = 64).localCheckpoint()
      best3(s"hnsw_probe_$tag")(
        graft.llm.Hnsw.hnswProbe(idx, queries, k = 10, ef = 96))
      graft.operators.Checkpoints.release(idx)
      graft.operators.Checkpoints.releaseLeaked(spark)
    }

    // --- DSIR importance selection at 5k and 50k docs
    for ((tag, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1", "10x" -> "/tmp/sf1x")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      best3(s"dsir_$tag")(graft.llm.Dsir.importanceSelect(
        docs, docs.filter(col("lang") === "en"), buckets = 4096,
        keepFraction = 0.25))
      graft.operators.Checkpoints.releaseLeaked(spark)
    }

    // --- exact histogram percentiles at 600k and 6M rows (synth 10x:
    // replicate with per-replica price offsets so the value domain
    // grows 10x too — the histogram's actual scale axis)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val li10 = (0 until 10).map(i =>
      li.withColumn("l_extendedprice", col("l_extendedprice") + lit(i * 0.001)))
      .reduce(_ unionByName _).localCheckpoint()
    best3("pctl_sf0.1")(graft.operators.Percentiles.groupedExact(
      li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9)))
    best3("pctl_10x")(graft.operators.Percentiles.groupedExact(
      li10, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9)))
    graft.operators.Checkpoints.release(li10)

    // --- r8 operators: dup-gram coverage and centroid outliers
    for ((tag, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1", "10x" -> "/tmp/sf1x")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      best3(s"dupgram_$tag")(
        graft.llm.TextAnalysis.dupGramCoverage(docs, k = 3))
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      best3(s"centroid_$tag")(
        graft.llm.Similarity.centroidOutliers(emb, "label", 0.05))
      graft.operators.Checkpoints.releaseLeaked(spark)
    }

    // --- video container parse at 1k and 10k synthetic blobs
    import spark.implicits._
    def media(n: Int) = spark.range(n.toLong)
      .map { i =>
        graft.llm.Multimodal.MediaRow(i, "video/avi",
          graft.llm.Multimodal.syntheticAvi(
            320 + (i % 8).toInt * 16, 240, fps = 25, frames = 40 + (i % 50).toInt))
      }.localCheckpoint()
    for ((tag, n) <- Seq("1k" -> 1000, "10k" -> 10000)) {
      val m = media(n)
      best3(s"videometa_$tag")(
        m.map(r => graft.llm.Multimodal.videoMeta(r.content)
          .map(v => (r.media_id, v.width, v.n_frames)).getOrElse((r.media_id, -1, -1L)))
          .toDF("media_id", "width", "n_frames"))
      graft.operators.Checkpoints.release(m.toDF())
    }
    spark.stop()
  }
}
