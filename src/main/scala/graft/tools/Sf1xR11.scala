// Scratch measurement entry: 10x scale curves for the r8 newcomers the
// BASELINE.md curve table does not yet cover post-AQE-off — q119 stride
// chunks, plus q117 dup-gram coverage and q118 centroid outliers
// re-run under the r8 harness settings (AQE off, derived partitions).
// Regenerates the /tmp/sf1x corpus with the round-7 recipe if absent:
// documents x10 (per-replica word-shuffled text, fresh doc_ids),
// embeddings x10 (+-0.02 per-replica perturbation, fresh vec_ids).
// Run: sbt -batch "runMain graft.Sf1xR11"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Sf1xR11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val sf1x = "/tmp/sf1x"
    if (!new java.io.File(s"$sf1x/documents.parquet").exists()) {
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val docs10 = (0 until 10).map { rep =>
        val shuffledText =
          if (rep == 0) col("text")
          else concat_ws(" ", expr(
            s"""transform(
                  array_sort(transform(split(text, ' '),
                    w -> struct(crc32(concat(w, '$rep',
                                      CAST(doc_id AS STRING))) AS h,
                                w AS w))),
                  s -> s.w)"""))
        docs.select((col("doc_id") * 10 + lit(rep)).as("doc_id"),
          shuffledText.as("text"), col("lang"), col("source"),
          col("n_chars"))
      }.reduce(_ unionByName _)
      docs10.repartition(8).write.mode("overwrite")
        .parquet(s"$sf1x/documents.parquet")
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val emb10 = (0 until 10).map { rep =>
        emb.select((col("vec_id") * 10 + lit(rep)).as("vec_id"),
          transform(col("embedding"),
            x => x + lit(((rep % 5) - 2) * 0.01f)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
      emb10.repartition(8).write.mode("overwrite")
        .parquet(s"$sf1x/embeddings.parquet")
      println("SF1XR11 generated /tmp/sf1x")
    }

    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SF1XR11 $tag best=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    for ((tag, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1", "10x" -> sf1x)) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      best3(s"q117_dupgram_$tag")(
        graft.llm.TextAnalysis.dupGramCoverage(docs, k = 3))
      best3(s"q119_stride_$tag")(
        graft.llm.Packing.strideChunks(docs, chunkSize = 32, overlap = 8))
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      best3(s"q118_centroid_$tag")(
        graft.llm.Similarity.centroidOutliers(emb, "label", 0.05))
      graft.operators.Checkpoints.releaseLeaked(spark)
    }

    // --- exact percentiles, all three forms, 600k and 6M rows (the
    // Sf1xR8 recipe: per-replica price offsets grow the value domain
    // 10x too — the histogram's scale axis, and near-unique at both
    // scales, the selection form's home regime)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val li10 = (0 until 10).map(i =>
      li.withColumn("l_extendedprice", col("l_extendedprice") + lit(i * 0.001)))
      .reduce(_ unionByName _).localCheckpoint()
    for ((tag, d) <- Seq("600k" -> li, "6M" -> li10)) {
      best3(s"pctl_hist1w_$tag")(graft.operators.Percentiles.groupedExact(
        d, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9),
        twoPhaseThreshold = Long.MaxValue))
      best3(s"pctl_hist2p_$tag")(graft.operators.Percentiles.groupedExact(
        d, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9),
        twoPhaseThreshold = 0L))
      best3(s"pctl_select_$tag")(graft.operators.Percentiles.groupedExactSelect(
        d, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9)))
    }
    graft.operators.Checkpoints.release(li10)
    spark.stop()
  }
}
