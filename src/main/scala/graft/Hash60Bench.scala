package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Hash60Bench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val n = 20000000L
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(s"$tag: ${(System.nanoTime() - t0) / 1e9}")
    }
    val s = spark.range(n).select(concat(lit("tok_"), col("id").cast("string")).as("s"))
    time("builtin conv(substr(md5))") {
      s.select(expr("bit_xor(CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))")).collect()
    }
    time("native graft_hash60") {
      s.select(expr("bit_xor(graft_hash60(s))")).collect()
    }
    spark.stop()
  }
}
