// Scratch: cost of the trailing wrapper orderBy at sf0.1 (range
// sampling job + exchange per query). Run: sbt "runMain graft.SortCost"
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SortCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SORTCOST $tag best=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val qs = graft.llm.TextAnalysis.qualityScores(docs)
    time("qualityScores_unsorted")(qs)
    time("qualityScores_sorted")(qs.orderBy(col("doc_id")))
    val pct = graft.operators.Percentiles.groupedExact(
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet"),
      "l_returnflag", "l_extendedprice", Seq(0.5, 0.9))
    time("groupedExact_unsorted")(pct)
    val hist = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("c"))
    time("hist_only")(hist)
    spark.stop()
  }
}
