// Scratch measurement entry: the q49 dual-regime cut (r13). At sf0.1
// the branched 4-scan form hides its exact branches behind the
// quantile-sketch stage and wins; this measures both forms at 10x
// lineitem (6M rows, distinct keys scaled 10x via per-replica key
// offsets) to certify the crossover direction the probe encodes.
// Run: sbt -batch "runMain graft.Q49Scale"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Q49Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = "/tmp/sf1x_lineitem_q49"
    if (!new java.io.File(path).exists()) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_returnflag"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"))
      (0 until 10).map { rep =>
        li.select(col("l_returnflag"),
          (col("l_partkey") + lit(rep.toLong * 10000000L)).as("l_partkey"),
          (col("l_suppkey") + lit(rep.toLong * 10000000L)).as("l_suppkey"),
          (col("l_extendedprice") + lit(rep * 0.001)).as("l_extendedprice"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(path)
      println(s"Q49SCALE generated $path")
    }
    val li10 = spark.read.parquet(path)
    println(s"Q49SCALE rows=${li10.count()}")

    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q49SCALE $tag best=${ts.min}%.2f " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }
    val b = best3("branched_10x")(graft.queries.QueryPackExt.q49Branched(li10))
    val f = best3("fused_10x")(graft.queries.QueryPackExt.q49Fused(li10))
    println(f"Q49SCALE fused/branched=${f / b}%.2f")
    spark.stop()
  }
}
