package graft
import org.apache.spark.sql.functions._
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val clusterEdges = (0 until 50000).flatMap { c =>
      val base = c.toLong * 10; (1 to 7).map(i => (base, base + i)) }
    val chainEdges = (0 until 1000).flatMap { c =>
      val base = 1000000L + c.toLong * 1000
      (0 until 200).map(i => (base + i, base + i + 1)) }
    val pairs = (clusterEdges ++ chainEdges).toDF("da", "db").repartition(8)
    val sym = pairs.select(col("da").as("a"), col("db").as("b"))
      .union(pairs.select(col("db").as("a"), col("da").as("b")))
      .distinct().localCheckpoint()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"CCPROBE $tag ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("star_mostly") { // 1 futile prop round, then star rounds
      val n = graft.llm.TextDedup.duplicateComponents(pairs,
        maxIter = 40, escalateAfter = 1, smallGraphMaxEdges = 0).count()
      println(s"CCPROBE star members=$n")
    }
    time("full_default") {
      val n = graft.llm.TextDedup.duplicateComponents(pairs, smallGraphMaxEdges = 0).count()
      println(s"CCPROBE full members=$n")
    }
    spark.stop()
  }
}
