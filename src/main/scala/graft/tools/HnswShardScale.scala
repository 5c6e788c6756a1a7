// Scratch measurement entry: HNSW build at SHARD scale (VERDICT r12
// #7). The r8 curve grew per-shard n 10x at fixed shard count and saw
// the expected n·log n growth (5.2x); the production story is the
// OTHER axis — scale shard count with corpus size, hold per-shard n
// constant, and buy the build back linearly with executors. This
// measures build wall at 12.5k → 200k vectors with per-shard n pinned
// at ~3125, shards 4 → 64 on local[32].
// Run: sbt -batch "runMain graft.HnswShardScale"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object HnswShardScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"HNSWSHARDS $tag best=${ts.min}%.2f " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    val dim = 64
    val results = Seq(12500 -> 4, 25000 -> 8, 100000 -> 32, 200000 -> 64)
      .map { case (n, shards) =>
        val emb = spark.range(n.toLong)
          .map(id => (id, graft.llm.Hnsw.fixtureVector(id, dim)))
          .toDF("vec_id", "embedding")
          .repartition(shards)
          .localCheckpoint() // timed op is the BUILD, not vector gen
        val t = best3(f"build_n${n}_s$shards")(
          graft.llm.Hnsw.hnswIndex(emb, m = 8, efConstruction = 64))
        graft.operators.Checkpoints.release(emb)
        (n, shards, t)
      }
    val (n0, _, t0) = results.head
    results.foreach { case (n, s, t) =>
      println(f"HNSWSHARDS n=$n%6d shards=$s%2d wall=$t%.2f s " +
        f"scaleup=${n.toDouble / n0}%.0fx wallGrowth=${t / t0}%.2fx " +
        f"usPerVector=${t * 1e6 / n}%.1f")
    }
    spark.stop()
  }
}
