// Scratch measurement entry (r15, VERDICT r14 #6): the q80 semantic-
// dedup growth curve — wall, near-dup PAIR count, and CC rounds at
// 1x / 3x / 10x the sf0.1 embeddings corpus, replicas built with the
// GenSf1 transform (vec_id offset, element-0 nudged by rep * 1e-3, so
// replicas form additional near-dup mass exactly like the certified
// sf1 fixture). The claim under test: q80's super-linear wall growth
// tracks the dup graph's own pair growth (output-intrinsic), not a
// plan defect — the pair column is the evidence, and DuckDB's 21x
// growth on the same 10x data (DUCK_SF1_r14.json) is the cross-engine
// control. Run: sbt -batch "runMain graft.Q80Curve"
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q80Curve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val base = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")

    def corpus(reps: Int) = (0 until reps).map { rep =>
      base.select(
        (col("vec_id") + lit(rep * 1000000000L)).as("vec_id"),
        (if (rep == 0) col("embedding")
         else transform(col("embedding"), (x, i) =>
           when(i === 0, x + lit(rep.toFloat * 1e-3f)).otherwise(x)))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionAll _).localCheckpoint()

    for (reps <- Seq(1, 3, 10)) {
      val emb = corpus(reps)
      val nVecs = emb.count()
      val pairs = graft.llm.Similarity.nearDupPairs(emb).count()
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.llm.Similarity.semanticDedup(emb, maxIter = 80)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val wall = math.min(once(), once())
      println(f"Q80CURVE reps=$reps vecs=$nVecs pairs=$pairs " +
        f"wall=$wall%.2f prop_rounds=${graft.llm.TextDedup.lastPropRounds} " +
        s"star_rounds=${graft.llm.TextDedup.lastStarRounds}")
      graft.operators.Checkpoints.releaseLeaked(spark)
    }
    spark.stop()
  }
}
