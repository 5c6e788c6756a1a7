// Scratch measurement entry (scripts/, not shipped in the library
// package tree): q80 semantic dedup at the 10x scale dataset with the
// maxIter rail raised — records the BASELINE.md datapoint the default
// rail refuses (documents the loud-failure behavior + the knob).
// Run: sbt -batch "runMain graft.Sf1xQ80"
// (lives under tools/ so sbt compiles it; package stays graft)
package graft

import org.apache.spark.sql.SparkSession

object Sf1xQ80 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1x")
    val spark = SparkSession.builder()
      .master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.llm.Similarity.semanticDedup(emb, maxIter = 80)
        .write.format("noop").mode("overwrite").save()
      graft.operators.Checkpoints.releaseLeaked(spark)
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    println(f"q80_sf1x_maxiter80_best=${math.min(once(), once())}%.2f s")
    spark.stop()
  }
}
