// Scratch diagnostic (r18, VERDICT r17 #4): per-stage attribution of
// q144 pairGraphCentrality at sf1 — pairs lineage (LSH sign + band
// join + rerank) vs the symmetric-edge checkpoint vs the k integer-
// mass rounds — to decide whether the 2.2-2.9x paired residual is the
// iteration checkpoints or the pair generation floor, and how much
// leg dispersion the query carries on this box.
// Run: sbt -batch "runMain graft.llm.Q144Decomp [sfDir]"
package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Q144Decomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master(graft.ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")

    def bestN(tag: String, n: Int = 5)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      graft.operators.Checkpoints.releaseLeaked(spark)
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        graft.operators.Checkpoints.releaseLeaked(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q144DECOMP $tag best=${ts.min}%.3f " +
        s"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    bestN("pairs_lineage")(
      TextDedup.minhashLshPairs(d, 3, 12, 4, 0.5))
    bestN("full_q144")(
      TextDedup.pairGraphCentrality(
        TextDedup.minhashLshPairs(d, 3, 12, 4, 0.5), iters = 3))
    // edge census: how big is the graph the iterations run over?
    val pairs = TextDedup.minhashLshPairs(d, 3, 12, 4, 0.5)
    println(s"Q144DECOMP n_pairs=${pairs.count()}")
    spark.stop()
  }
}
